"""Clebsch-Gordan tensor products over irreps (XLA reference path).

TPU-native replacement for e3nn's ``o3.TensorProduct`` /
``FullyConnectedTensorProduct`` used by the reference's interaction block
(``/root/reference/nequip/nn/interaction_block.py:89-146``,
``_tp_scatter_base.py:24-31``).

Design notes (TPU-first):
* features are in the ir_mul layout (see ``nequip_tpu.ops.irreps``): each
  chunk reshapes to ``(..., 2l+1, mul)`` with channels last, so the per-path
  contraction ``C[ijk] * x1[...iu] * x2[...jv]`` lowers to small batched
  ``dot_general`` ops over the large leading (edge/node) dimension — XLA
  fuses the CG contraction with the surrounding elementwise work.
* normalization follows e3nn's ``irrep_normalization="component"`` +
  ``path_normalization="element"`` so the numerics of trained models match
  the reference architecture's variance contract: the CG tensor is scaled by
  ``sqrt(2*l_out+1)`` and each path by
  ``sqrt(1 / sum_{paths -> same output} fan(path))``.
* the hot fused gather-TP-scatter path lives in
  ``nequip_tpu.ops.pallas.tp_scatter``; this module is the always-correct
  reference implementation and the autodiff fallback.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .cg import cg_component_normalized
from .irreps import Irrep, Irreps, MulIrrep


@dataclass(frozen=True)
class Instruction:
    i_in1: int
    i_in2: int
    i_out: int
    mode: str  # "uvu" | "uvw" | "uuu"
    has_weight: bool
    path_weight: float = 1.0

    @property
    def key(self) -> Tuple[int, int, int, str]:
        return (self.i_in1, self.i_in2, self.i_out, self.mode)


def _fan(mode: str, mul1: int, mul2: int) -> int:
    """Number of summed elements feeding one output channel (e3nn 'element')."""
    if mode == "uvw":
        return mul1 * mul2
    if mode == "uvu":
        return mul2
    if mode == "uuu":
        return 1
    raise ValueError(f"unknown TP mode {mode}")


class TensorProduct:
    """Static spec + functional apply for an instruction-based CG tensor product.

    ``instructions``: list of ``(i_in1, i_in2, i_out, mode, has_weight)``.

    Weights for ``uvu`` paths have shape ``(mul1, mul2)``; for ``uvw``
    ``(mul1, mul2, mul_out)``.  They are flattened and concatenated in
    instruction order into a single weight vector of length ``weight_numel``
    (optionally with leading batch dims when ``shared_weights=False``), the
    same contract the reference's radial MLP targets
    (``interaction_block.py:119-127``).
    """

    def __init__(
        self,
        irreps_in1,
        irreps_in2,
        irreps_out,
        instructions: Sequence[Tuple],
        shared_weights: bool = False,
    ):
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        self.irreps_out = Irreps(irreps_out)
        self.shared_weights = shared_weights

        ins: List[Instruction] = []
        for tup in instructions:
            i1, i2, io, mode, has_w = tup[:5]
            ins.append(Instruction(i1, i2, io, mode, bool(has_w)))

        # validate selection rules
        for i in ins:
            ir1 = self.irreps_in1[i.i_in1].ir
            ir2 = self.irreps_in2[i.i_in2].ir
            ir3 = self.irreps_out[i.i_out].ir
            assert ir3 in set(ir1 * ir2), f"invalid path {i}: {ir1} x {ir2} -/-> {ir3}"
            if i.mode == "uvu":
                assert self.irreps_in1[i.i_in1].mul == self.irreps_out[i.i_out].mul

        # e3nn path normalization ("element"): per output chunk, sum the fans
        fan_per_out = [0.0] * len(self.irreps_out)
        for i in ins:
            fan_per_out[i.i_out] += _fan(
                i.mode, self.irreps_in1[i.i_in1].mul, self.irreps_in2[i.i_in2].mul
            )
        self.instructions: List[Instruction] = [
            replace(i, path_weight=float(fan_per_out[i.i_out]) ** -0.5) for i in ins
        ]

        # weight bookkeeping
        self._weight_slices: List[Optional[slice]] = []
        self._weight_shapes: List[Optional[Tuple[int, ...]]] = []
        off = 0
        for i in self.instructions:
            if not i.has_weight:
                self._weight_slices.append(None)
                self._weight_shapes.append(None)
                continue
            mul1 = self.irreps_in1[i.i_in1].mul
            mul2 = self.irreps_in2[i.i_in2].mul
            if i.mode == "uvu":
                shape = (mul1, mul2)
            elif i.mode == "uvw":
                shape = (mul1, mul2, self.irreps_out[i.i_out].mul)
            elif i.mode == "uuu":
                shape = (mul1,)
            else:
                raise ValueError(i.mode)
            n = int(np.prod(shape))
            self._weight_slices.append(slice(off, off + n))
            self._weight_shapes.append(shape)
            off += n
        self.weight_numel = off

    # ------------------------------------------------------------------
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, weights: Optional[jnp.ndarray]) -> jnp.ndarray:
        """x1: (..., dim1), x2: (..., dim2), weights: (..., weight_numel) or
        (weight_numel,) if shared.  Returns (..., dim_out)."""
        assert x1.shape[-1] == self.irreps_in1.dim, (x1.shape, self.irreps_in1)
        assert x2.shape[-1] == self.irreps_in2.dim, (x2.shape, self.irreps_in2)
        batch_shape = jnp.broadcast_shapes(x1.shape[:-1], x2.shape[:-1])

        sl1 = self.irreps_in1.slices()
        sl2 = self.irreps_in2.slices()
        sl3 = self.irreps_out.slices()

        chunks_out: List[Optional[jnp.ndarray]] = [None] * len(self.irreps_out)
        for idx, ins in enumerate(self.instructions):
            mi1 = self.irreps_in1[ins.i_in1]
            mi2 = self.irreps_in2[ins.i_in2]
            mi3 = self.irreps_out[ins.i_out]
            c1 = x1[..., sl1[ins.i_in1]].reshape(x1.shape[:-1] + (mi1.ir.dim, mi1.mul))
            c2 = x2[..., sl2[ins.i_in2]].reshape(x2.shape[:-1] + (mi2.ir.dim, mi2.mul))
            cg = jnp.asarray(
                cg_component_normalized(mi1.ir.l, mi2.ir.l, mi3.ir.l), dtype=x1.dtype
            )

            if ins.has_weight:
                assert weights is not None
                w = weights[..., self._weight_slices[idx]]
                w = w.reshape(w.shape[:-1] + self._weight_shapes[idx])
            else:
                w = None

            if ins.mode == "uvu" and mi2.mul == 1:
                # fast path (the conv hot op): explicit outer product then one
                # CG matmul — XLA lowers this to two dot_generals, ~2.5x
                # faster than the fused 3/4-operand einsum on TPU
                d1, d2, d3 = mi1.ir.dim, mi2.ir.dim, mi3.ir.dim
                # c1 [..., d1, mul] x c2 [..., d2, 1] -> z [..., d1*d2, mul]
                z = (c1[..., :, None, :] * c2[..., None, :, :]).reshape(
                    batch_shape + (d1 * d2, mi1.mul)
                )
                cgm = cg.reshape(d1 * d2, d3)
                out = jnp.einsum("...pu,pk->...ku", z, cgm)
                if w is not None:
                    out = out * w[..., 0][..., None, :]
            elif ins.mode == "uvu":
                if w is None:
                    out = jnp.einsum("ijk,...iu,...jv->...ku", cg, c1, c2)
                else:
                    out = jnp.einsum("ijk,...iu,...jv,...uv->...ku", cg, c1, c2, w)
            elif ins.mode == "uvw":
                assert w is not None
                if self.shared_weights:
                    out = jnp.einsum("ijk,...iu,...jv,uvw->...kw", cg, c1, c2, w)
                else:
                    out = jnp.einsum("ijk,...iu,...jv,...uvw->...kw", cg, c1, c2, w)
            elif ins.mode == "uuu":
                if w is None:
                    out = jnp.einsum("ijk,...iu,...ju->...ku", cg, c1, c2)
                else:
                    out = jnp.einsum("ijk,...iu,...ju,...u->...ku", cg, c1, c2, w)
            else:
                raise ValueError(ins.mode)

            out = out * ins.path_weight
            out = out.reshape(batch_shape + (mi3.dim,))
            prev = chunks_out[ins.i_out]
            chunks_out[ins.i_out] = out if prev is None else prev + out

        pieces = []
        for mi, c in zip(self.irreps_out, chunks_out):
            if c is None:
                c = jnp.zeros(batch_shape + (mi.dim,), dtype=x1.dtype)
            pieces.append(c)
        return jnp.concatenate(pieces, axis=-1)

    # ------------------------------------------------------------------
    def init_weights(self, rng) -> Optional[jnp.ndarray]:
        """Standard-normal internal weights (only meaningful when shared)."""
        import jax

        if self.weight_numel == 0:
            return None
        return jax.random.normal(rng, (self.weight_numel,))


def fully_connected_tensor_product(
    irreps_in1, irreps_in2, irreps_out
) -> TensorProduct:
    """All-paths 'uvw' TP with internal shared weights.

    Mirrors e3nn's ``FullyConnectedTensorProduct`` used for the interaction
    block's self-connection (``interaction_block.py:141-146``).
    """
    irreps_in1 = Irreps(irreps_in1)
    irreps_in2 = Irreps(irreps_in2)
    irreps_out = Irreps(irreps_out)
    instructions = []
    for i, mi1 in enumerate(irreps_in1):
        for j, mi2 in enumerate(irreps_in2):
            for k, mi3 in enumerate(irreps_out):
                if mi3.ir in set(mi1.ir * mi2.ir):
                    instructions.append((i, j, k, "uvw", True))
    return TensorProduct(
        irreps_in1, irreps_in2, irreps_out, instructions, shared_weights=True
    )


def uvu_instructions(
    irreps_in1: Irreps, irreps_in2: Irreps, irreps_out_filter: Irreps
) -> Tuple[Irreps, List[Tuple[int, int, int, str, bool]]]:
    """Build the NequIP conv instruction list.

    Mirrors ``/root/reference/nequip/nn/interaction_block.py:89-109``: for
    every (input chunk, SH chunk) pair and every CG-allowed output irrep that
    appears in the requested output, emit one ``uvu`` path; sort the resulting
    output irreps by (l, p) and permute instruction outputs to match.
    """
    irreps_mid: List[MulIrrep] = []
    instructions: List[Tuple[int, int, int, str, bool]] = []
    for i, mi1 in enumerate(irreps_in1):
        for j, mi2 in enumerate(irreps_in2):
            for ir_out in mi1.ir * mi2.ir:
                if ir_out in irreps_out_filter:
                    k = len(irreps_mid)
                    irreps_mid.append(MulIrrep(mi1.mul, ir_out))
                    instructions.append((i, j, k, "uvu", True))
    irreps_mid = Irreps(irreps_mid)
    irreps_mid, perm, _ = irreps_mid.sort()
    instructions = [(i1, i2, perm[io], mode, w) for (i1, i2, io, mode, w) in instructions]
    return irreps_mid, instructions
