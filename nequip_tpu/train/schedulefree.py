"""Schedule-free optimization (Defazio et al.).

Parity: ``ScheduleFreeLightningModule``
(``/root/reference/nequip/train/schedulefree.py``): wraps optax's
schedule-free transform; the reference's train/eval *mode switching* maps to
``evaluation_params`` returning the schedule-free evaluation interpolation.

Note on frozen parameters: ``schedule_free`` wraps *outside* the
frozen-param masking so its (y, z) state spans the full tree — frozen leaves
get zero base updates and the eval interpolation leaves them unchanged.
"""

from __future__ import annotations

from typing import Optional

import optax
import optax.contrib

from .state import TrainState
from .training_module import NequIPTrainModule


class ScheduleFreeTrainModule(NequIPTrainModule):
    """Training module using a schedule-free optimizer.

    ``optimizer`` config is the *base* optimizer (e.g. adam); warmup is
    expressed through the schedule-free learning rate schedule.
    """

    def __init__(
        self,
        *args,
        warmup_steps: int = 0,
        sf_b1: float = 0.9,
        learning_rate: float = 1.0,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.sf_b1 = float(sf_b1)
        if warmup_steps > 0:
            self._sf_lr = optax.schedules.linear_schedule(
                0.0, learning_rate, warmup_steps
            )
        else:
            self._sf_lr = learning_rate
        # rebuild: schedule_free must be OUTSIDE the frozen-mask transform
        self._inner_opt_builder = super()._opt_for
        self.optimizer = None if self._frozen_paths else self._wrap(self._base_opt)

    def _wrap(self, inner):
        return optax.contrib.schedule_free(
            inner, learning_rate=self._sf_lr, b1=self.sf_b1
        )

    def _opt_for(self, params):
        if not self._frozen_paths:
            return self._wrap(self._base_opt)
        return self._wrap(self._inner_opt_builder(params))

    def evaluation_params(self, state: TrainState):
        # top-level opt state is the ScheduleFreeState
        return optax.contrib.schedule_free_eval_params(state.opt_state, state.params)


ScheduleFreeLightningModule = ScheduleFreeTrainModule
