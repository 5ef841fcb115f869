"""Loss-coefficient schedulers.

Parity: ``/root/reference/nequip/train/callbacks/loss_coeff_scheduler.py``:
step scheduler (change coefficients at given epochs) and linear interpolation
scheduler.  Coefficients are applied through the trainer's runtime
loss-coefficient vector, so no recompilation happens.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .base import Callback


class LossCoefficientScheduler(Callback):
    """``schedule``: {epoch: {loss_name: coeff, ...}, ...}."""

    def __init__(self, schedule: Dict[int, Dict[str, float]]):
        self.schedule = {int(k): dict(v) for k, v in schedule.items()}

    def on_train_epoch_start(self, trainer, module, epoch: int) -> None:
        if epoch in self.schedule:
            trainer.set_loss_coeffs(self.schedule[epoch])


class LinearLossCoefficientScheduler(Callback):
    """Linearly interpolate coefficients between two epochs.

    Parity: ``LinearLossCoefficientScheduler`` (``loss_coeff_scheduler.py:100-195``).
    """

    def __init__(
        self,
        initial_coeffs: Dict[str, float],
        final_coeffs: Dict[str, float],
        start_epoch: int,
        end_epoch: int,
    ):
        assert set(initial_coeffs) == set(final_coeffs)
        assert end_epoch > start_epoch
        self.initial = dict(initial_coeffs)
        self.final = dict(final_coeffs)
        self.start_epoch = int(start_epoch)
        self.end_epoch = int(end_epoch)

    def on_train_epoch_start(self, trainer, module, epoch: int) -> None:
        if epoch < self.start_epoch:
            coeffs = self.initial
        elif epoch >= self.end_epoch:
            coeffs = self.final
        else:
            t = (epoch - self.start_epoch) / (self.end_epoch - self.start_epoch)
            coeffs = {
                k: (1 - t) * self.initial[k] + t * self.final[k] for k in self.initial
            }
        trainer.set_loss_coeffs(coeffs)
