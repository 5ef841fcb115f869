"""Schedule the matmul-precision (TF32-analog) during training.

Parity: ``/root/reference/nequip/train/callbacks/tf32_scheduler.py`` — the
reference toggles CUDA TF32 mid-training; on TPU the same knob is
``jax.default_matmul_precision`` (bf16-based fast paths vs strict f32).
"""

from __future__ import annotations

from typing import Dict

from ...utils.global_state import set_tf32
from .base import Callback


class TF32Scheduler(Callback):
    """``schedule``: {epoch: bool} — e.g. fast matmuls early, strict later."""

    def __init__(self, schedule: Dict[int, bool]):
        self.schedule = {int(k): bool(v) for k, v in schedule.items()}

    def on_train_epoch_start(self, trainer, module, epoch: int) -> None:
        if epoch in self.schedule:
            set_tf32(self.schedule[epoch])
