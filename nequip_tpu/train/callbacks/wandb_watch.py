"""Weights & Biases logging (optional dependency, no-op without wandb).

Parity: ``WandbWatch`` (``/root/reference/nequip/train/callbacks/wandb_watch.py``).
"""

from __future__ import annotations

from .base import Callback


class WandbWatch(Callback):
    def __init__(self, project: str = "nequip-tpu", **init_kwargs):
        self.project = project
        self.init_kwargs = init_kwargs
        self._run = None

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

    def on_train_epoch_end(self, trainer, module, epoch: int, metrics) -> None:
        if self._run is not None:
            self._run.log(metrics, step=epoch)
