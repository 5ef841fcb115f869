"""Data-parallel training over a device mesh.

Replaces DDP (``/root/reference/nequip/train/simple_ddp.py``, flat-gradient
NCCL all-reduce) with ``shard_map`` over an ICI mesh:

* every device holds a replicated ``TrainState`` and its own padded
  micro-batch (a leading device axis on every batch array);
* inside the step, masked loss sums are ``psum``'d before the loss is formed
  and gradients are ``psum``'d after — the update is the *exact* global-batch
  gradient, identical on every device (no loss*world_size compensation
  tricks, cf. ``lightning.py:259-267``);
* metric accumulators merge with the same ``psum``, so epoch metrics are
  exactly batch-size and device-count invariant.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.8 promoted shard_map
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


from ..data import _keys

# fields whose device axis is axis 1 (edge_index/edge_type are (2, E))
_AXIS1_FIELDS = {_keys.EDGE_INDEX_KEY, _keys.EDGE_TYPE_KEY}


def _concat_axis(key: str) -> int:
    return 1 if key in _AXIS1_FIELDS else 0


def stack_microbatches(batches: List[dict]) -> dict:
    """Concatenate identically-padded per-device batches along their natural
    axis (nodes/edges/frames; ``edge_index`` along axis 1).  shard_map then
    splits them back so each device sees exactly one micro-batch with local
    indices."""
    keys = batches[0].keys()
    shapes = [{k: tuple(b[k].shape) for k in keys} for b in batches]
    assert all(s == shapes[0] for s in shapes), (
        "DP micro-batches must be identically padded (same capacity bucket); "
        "group_batches() does this grouping automatically for any n_buckets"
    )
    return {
        k: jnp.concatenate([b[k] for b in batches], axis=_concat_axis(k))
        for k in keys
    }


def batch_pspecs(batch: dict, axis_name: str = "dp") -> dict:
    """PartitionSpec pytree for a concatenated super-batch."""
    return {
        k: (P(None, axis_name) if _concat_axis(k) == 1 else P(axis_name))
        for k in batch.keys()
    }


def shard_batch_for_dp(batch: dict, mesh: Mesh, axis_name: str = "dp") -> dict:
    """Place a concatenated super-batch with the device axis sharded."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, spec))
        for (k, v), spec in zip(batch.items(), batch_pspecs(batch, axis_name).values())
    }


def mask_out_batch(batch: dict) -> dict:
    """A copy of a padded batch with every padding mask set to False.

    Used as tail filler when the number of micro-batches is not divisible by
    the device count: a fully-masked micro-batch contributes exactly zero to
    the psum'd loss sums, metric accumulators, and (through the masked error
    terms) gradients, so the DP step stays *exact* — no gradient rescaling or
    dropped data (cf. DDP's drop_last/uneven-batch caveats).
    """
    out = dict(batch)
    for k in (_keys.NODE_MASK_KEY, _keys.EDGE_MASK_KEY, _keys.FRAME_MASK_KEY):
        if k in out:
            out[k] = jnp.zeros_like(out[k])
    return out


class DataParallel:
    """Wrap a training module's step functions in shard_map over a mesh."""

    def __init__(self, module, mesh: Optional[Mesh] = None, axis_name: str = "dp"):
        from .mesh import make_mesh

        self.module = module
        self.mesh = mesh if mesh is not None else make_mesh(axis_names=(axis_name,))
        self.axis_name = axis_name
        self.n_devices = self.mesh.shape[axis_name]

    # ------------------------------------------------------------------
    def make_train_step(self, example_batch: Optional[dict] = None) -> Callable:
        step = self.module.make_train_step(axis_name=self.axis_name)
        ax = self.axis_name

        def wrapped(state, batch, loss_coeffs, lr_scale=None):
            if lr_scale is None:
                lr_scale = jnp.asarray(1.0, dtype=jnp.float32)
            smapped = _shard_map(
                step,
                mesh=self.mesh,
                in_specs=(P(), batch_pspecs(batch, ax), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
            return smapped(state, batch, loss_coeffs, lr_scale)

        from ..utils.global_state import donate_argnums

        return jax.jit(wrapped, donate_argnums=donate_argnums(0))

    def make_eval_step(self, metrics=None) -> Callable:
        mgr = metrics or self.module.val_metrics
        ax = self.axis_name

        def eval_step(params, metrics_state, batch):
            # accumulate locally; psum the *delta* so the replicated state
            # stays consistent across devices
            bs = mgr.batch_state(self.module.model(params, batch), batch)
            bs = mgr.psum_batch(bs, ax)
            return mgr.accumulate(metrics_state, bs)

        def wrapped(params, metrics_state, batch):
            smapped = _shard_map(
                eval_step,
                mesh=self.mesh,
                in_specs=(P(), P(), batch_pspecs(batch, ax)),
                out_specs=P(),
                check_vma=False,
            )
            # second element mirrors the single-device eval step's (state, out)
            # interface; per-device model outputs are not gathered under DP
            return smapped(params, metrics_state, batch), None

        from ..utils.global_state import donate_argnums

        return jax.jit(wrapped, donate_argnums=donate_argnums(1))

    # ------------------------------------------------------------------
    def replicate_state(self, state):
        sharding = NamedSharding(self.mesh, P())
        return jax.device_put(state, sharding)

    def prepare_batches(self, batches: List[dict]) -> dict:
        assert len(batches) == self.n_devices, (
            f"need {self.n_devices} micro-batches, got {len(batches)}"
        )
        return shard_batch_for_dp(stack_microbatches(batches), self.mesh, self.axis_name)

    def group_batches(self, batches: Iterable[dict]) -> Iterator[dict]:
        """Group per-device micro-batches from a DataLoader into sharded
        super-batches, **bucket-aware**: micro-batches are grouped by their
        padded shape signature, so capacity bucketing (``DataLoader(
        n_buckets>1)``) composes with data parallelism — each bucket gets its
        own compiled step (one jit signature per bucket, exactly as in the
        single-device case) instead of forcing worst-case padding everywhere.

        Grouping reorders batches *within* an epoch (a batch waits until
        ``n_devices`` of its bucket arrive) but drops nothing: at the end,
        each bucket's tail is filled with fully-masked copies of its last
        micro-batch (exact: they contribute zero to psum'd loss sums,
        metrics, and gradients)."""
        bufs: Dict[tuple, List[dict]] = {}
        order: List[tuple] = []  # flush in first-seen order (deterministic)
        for b in batches:
            sig = tuple(sorted((k, tuple(np.shape(v))) for k, v in b.items()))
            if sig not in bufs:
                bufs[sig] = []
                order.append(sig)
            buf = bufs[sig]
            buf.append(b)
            if len(buf) == self.n_devices:
                yield self.prepare_batches(buf)
                bufs[sig] = []
        for sig in order:
            buf = bufs[sig]
            if buf:
                filler = mask_out_batch(buf[-1])
                while len(buf) < self.n_devices:
                    buf.append(filler)
                yield self.prepare_batches(buf)
