"""Profiling + FLOP accounting utilities.

The reference has no dedicated profiler (SURVEY §5 — observability is
wandb/TrainingStatsMonitor only); on TPU the right tools are the JAX
profiler (XProf/TensorBoard traces) and the compiled executable's
``cost_analysis()``.  This module packages both:

* :func:`cost_analysis_of` / :func:`flops_per_step` — exact HLO-level FLOP /
  byte counts of a jitted function at given arguments (NOTE: Pallas custom
  calls are opaque to XLA's analysis; for kernel impls measure the pure-XLA
  implementation of the same computation, as ``bench.py`` does);
* :func:`trace` — context manager writing a JAX profiler trace viewable in
  TensorBoard / xprof;
* :class:`JaxProfilerCallback` — Trainer callback that captures a trace of a
  step window (skipping the compile-heavy first steps).
"""

from __future__ import annotations

import contextlib
import logging
from typing import Any, Dict, Optional

log = logging.getLogger("nequip_tpu")


def cost_analysis_of(fn, *args, static_argnums=(), **kwargs) -> Dict[str, float]:
    """Compile ``fn`` at the given args and return XLA's cost analysis.

    Keys of interest: ``flops``, ``bytes accessed``, ``transcendentals``.
    """
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn, static_argnums=static_argnums)
    ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return dict(ca)


def flops_per_step(fn, *args, **kwargs) -> float:
    """Exact HLO FLOPs of one call of ``fn`` at the given arguments."""
    return float(cost_analysis_of(fn, *args, **kwargs).get("flops", float("nan")))


def mfu(flops: float, seconds: float, peak_flops: float = 197e12) -> float:
    """Model FLOP utilization vs an accelerator peak (default: v5e bf16)."""
    return flops / seconds / peak_flops


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a JAX profiler trace (view with TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {log_dir}")


class JaxProfilerCallback:
    """Trainer callback: trace steps [start_step, end_step) to ``log_dir``.

    Defaults skip the first steps (compilation) and capture a short window —
    the standard TPU profiling recipe.  Usage in a config:

    .. code-block:: yaml

        trainer:
          callbacks:
            - _target_: nequip_tpu.utils.profiling.JaxProfilerCallback
              log_dir: ./profile
              start_step: 5
              end_step: 8
    """

    def __init__(self, log_dir: str = "./profile", start_step: int = 5, end_step: int = 8):
        assert end_step > start_step >= 0
        self.log_dir = log_dir
        self.start_step = int(start_step)
        self.end_step = int(end_step)
        self._active = False
        self._done = False

    # Callback API (duck-typed; see train/callbacks/base.py)
    def on_train_start(self, trainer, module) -> None: ...

    def on_train_epoch_start(self, trainer, module, epoch: int) -> None: ...

    def on_train_batch_end(self, trainer, module, logs: Dict[str, Any], step: int) -> None:
        import jax

        if self._done:
            return
        if not self._active and step >= self.start_step:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
            log.info(f"profiler: tracing from step {step}")
        elif self._active and step >= self.end_step:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            log.info(f"profiler: trace written to {self.log_dir}")

    def on_train_epoch_end(self, trainer, module, epoch: int, metrics) -> None:
        import jax

        if self._active:  # short runs: close the trace at epoch end
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            log.info(f"profiler: trace written to {self.log_dir}")

    def on_validation_epoch_end(self, trainer, module, epoch: int, metrics) -> None: ...

    def on_test_epoch_end(self, trainer, module, metrics) -> None: ...

    def state_dict(self) -> dict:
        return {"done": self._done}

    def load_state_dict(self, state: dict) -> None:
        self._done = bool(state.get("done", False))
