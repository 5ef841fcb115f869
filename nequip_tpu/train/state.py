"""TrainState: the complete, checkpointable training state pytree.

Replaces the reference's Lightning module state (model weights, optimizer
state, EMA buffers, metric accumulators, run-stage bookkeeping —
``/root/reference/nequip/train/lightning.py``, ``ema.py``) with one explicit
pytree that jit/shard_map thread through the training step and that
serializes bit-exactly for restart equivalence.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # global optimizer step
    params: Any
    opt_state: Any
    rng: Any
    ema_params: Any = None
    ema_step: Optional[jnp.ndarray] = None
    loss_state: Any = None  # running loss accumulators (epoch)
