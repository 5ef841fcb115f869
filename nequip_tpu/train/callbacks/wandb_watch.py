"""Weights & Biases logging (optional dependency, no-op without wandb).

Parity: ``WandbWatch`` (``/root/reference/nequip/train/callbacks/wandb_watch.py``),
which calls ``wandb.watch(model)`` to stream weight/gradient histograms.
JAX has no autograd hooks to intercept gradients inside the jitted step, so
the equivalent observability here is:

* per-leaf **weight histograms** and L2 norms every ``log_every_epochs``;
* per-leaf **update histograms** (parameter delta since the previous watch
  point) — the optimizer-integrated counterpart of gradient histograms,
  which is what the histograms are used for in practice (dead/exploding
  layer diagnosis).
"""

from __future__ import annotations

import numpy as np

from .base import Callback


class WandbWatch(Callback):
    def __init__(
        self,
        project: str = "nequip-tpu",
        log_every_epochs: int = 1,
        watch_weights: bool = True,
        watch_updates: bool = True,
        **init_kwargs,
    ):
        self.project = project
        self.init_kwargs = init_kwargs
        self.log_every_epochs = int(log_every_epochs)
        self.watch_weights = watch_weights
        self.watch_updates = watch_updates
        self._run = None
        self._prev = None

    # -- helpers ---------------------------------------------------------
    @staticmethod
    def _leaves(params):
        import jax

        flat = jax.tree_util.tree_flatten_with_path(jax.device_get(params))[0]
        out = {}
        for path, leaf in flat:
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            out[name] = np.asarray(leaf)
        return out

    def _histograms(self, leaves, prefix):
        import wandb

        logs = {}
        for name, arr in leaves.items():
            logs[f"{prefix}/{name}"] = wandb.Histogram(arr.reshape(-1))
            logs[f"{prefix}_norm/{name}"] = float(np.linalg.norm(arr))
        return logs

    # -- hooks -----------------------------------------------------------
    def on_train_start(self, trainer, module) -> None:
        try:
            import wandb
        except ImportError:
            import logging

            logging.getLogger("nequip_tpu").warning(
                "wandb not installed; WandbWatch is a no-op"
            )
            return
        self._run = wandb.init(project=self.project, **self.init_kwargs)
        if self.watch_updates and getattr(trainer, "state", None) is not None:
            self._prev = self._leaves(trainer.state.params)

    def on_train_epoch_end(self, trainer, module, epoch: int, metrics) -> None:
        if self._run is None:
            return
        logs = dict(metrics)
        if epoch % self.log_every_epochs == 0 and getattr(trainer, "state", None) is not None:
            leaves = self._leaves(trainer.state.params)
            if self.watch_weights:
                logs.update(self._histograms(leaves, "weights"))
            if self.watch_updates:
                if self._prev is not None:
                    deltas = {
                        k: v - self._prev[k] for k, v in leaves.items() if k in self._prev
                    }
                    logs.update(self._histograms(deltas, "updates"))
                self._prev = leaves
        self._run.log(logs, step=epoch)
