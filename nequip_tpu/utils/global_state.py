"""Global numerical state for the framework.

The reference keeps two dtypes (``/root/reference/nequip/utils/global_dtype.py``,
``global_state.py:66-186``): a fixed float64 "global dtype" for raw data and
energy accumulation, and a ``model_dtype`` (f32/f64) for network weights.

On TPU, float64 is emulated and slow, so the policy is adapted:

* the global dtype follows ``jax_enable_x64``: float64 on CPU test runs
  (where the reference's 1e-12-level parity gates are enforced), float32 on
  TPU production runs;
* ``model_dtype`` is a per-model setting threaded through module
  construction via a context (see ``nequip_tpu.utils.dtype``);
* the TF32 toggle maps to ``jax.default_matmul_precision``
  ("highest" = strict f32, "default"/"tensorfloat32" = fast path).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_GLOBAL_STATE = {
    "initialized": False,
    "allow_tf32": False,
}


def global_dtype():
    """float64 when x64 is enabled (CPU/test), else float32 (TPU prod)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def set_global_state(allow_tf32: bool = False, seed: Optional[int] = None) -> None:
    """Initialize process-wide numerical defaults.

    Parity: ``set_global_state`` (``utils/global_state.py:66``) — seeding is
    handled explicitly through jax PRNG keys instead of a global seed, and
    dynamo/JIT-fusion flags have no analog (XLA fuses by default).
    """
    _GLOBAL_STATE["initialized"] = True
    set_tf32(allow_tf32)


def set_tf32(enabled: bool) -> None:
    _GLOBAL_STATE["allow_tf32"] = bool(enabled)
    jax.config.update(
        "jax_default_matmul_precision", "tensorfloat32" if enabled else "highest"
    )


def tf32_enabled() -> bool:
    """Whether fast-math (TF32-analog) matmul mode is on — consulted by the
    Pallas kernels so explicit kernel precisions follow the same toggle as
    XLA's default matmul precision."""
    return bool(_GLOBAL_STATE["allow_tf32"])


def get_latest_global_state() -> dict:
    return {
        "allow_tf32": _GLOBAL_STATE["allow_tf32"],
        "x64": bool(jax.config.jax_enable_x64),
    }


def donate_argnums(*nums: int) -> tuple:
    """Buffer-donation policy for the hot step functions — DEFAULT OFF.

    Measured on the tunneled v5e (ROUND5_NOTES, 2026-08-19): jitting the
    SAME fr train step with ``donate_argnums=(0,)`` runs at 16.3 s/step vs
    0.47 s/step without donation at 23k atoms — a 34x runtime pathology of
    input-output-aliased executables on this TPU runtime, reproduced across
    processes and sessions (it was the entire mystery gap between the
    official 1,405 atom-steps/s train row and the ~46k the program's pieces
    sum to).  The memory donation saves here (params/opt-state/EMA, a few
    MB; batch arrays at most ~100s of MB at 100k atoms) is noise next to
    the multi-GiB activation envelope, so donation defaults OFF everywhere
    and ``NEQUIP_DONATE_BUFFERS=1`` re-enables it for runtimes where
    aliasing is free.
    """
    import os

    if os.environ.get("NEQUIP_DONATE_BUFFERS", "0") == "1":
        return tuple(nums)
    return ()
