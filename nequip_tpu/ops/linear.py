"""Equivariant linear maps over irreps (per-l block matmuls).

TPU-native replacement for e3nn's ``o3.Linear``
(``/root/reference/nequip/nn/interaction_block.py:82-87,128-137``).

In the ir_mul layout a linear map between irreps is, per output chunk, a sum
of plain matmuls ``(..., 2l+1, mul_in) @ (mul_in, mul_out)`` over all input
chunks with the same irrep — exactly the shape the MXU wants (leading dims
collapse to one big row dimension).  Weights are initialized ~N(0,1) and each
path is scaled at apply time by ``1/sqrt(sum of contributing mul_in)``
(e3nn's ``path_normalization="element"``), so output variance ~1.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .irreps import Irreps


class Linear:
    """Static spec + functional apply/init for an irreps-wise linear layer."""

    def __init__(self, irreps_in, irreps_out):
        self.irreps_in = Irreps(irreps_in)
        self.irreps_out = Irreps(irreps_out)

        # instructions: all (i_in -> i_out) with matching irreps
        self.instructions: List[Tuple[int, int]] = [
            (i, j)
            for i, mi_in in enumerate(self.irreps_in)
            for j, mi_out in enumerate(self.irreps_out)
            if mi_in.ir == mi_out.ir
        ]
        fan_per_out = [0] * len(self.irreps_out)
        for i, j in self.instructions:
            fan_per_out[j] += self.irreps_in[i].mul
        self._alpha = [
            float(fan_per_out[j]) ** -0.5 if fan_per_out[j] > 0 else 0.0
            for j in range(len(self.irreps_out))
        ]

    def init(self, rng) -> Dict[str, jnp.ndarray]:
        params = {}
        keys = jax.random.split(rng, max(len(self.instructions), 1))
        for idx, (i, j) in enumerate(self.instructions):
            params[f"w{i}_{j}"] = jax.random.normal(
                keys[idx], (self.irreps_in[i].mul, self.irreps_out[j].mul)
            )
        return params

    def __call__(self, params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == self.irreps_in.dim, (x.shape, self.irreps_in)
        sl_in = self.irreps_in.slices()
        batch = x.shape[:-1]

        out_chunks: List[Optional[jnp.ndarray]] = [None] * len(self.irreps_out)
        for i, j in self.instructions:
            mi_in = self.irreps_in[i]
            mi_out = self.irreps_out[j]
            c = x[..., sl_in[i]].reshape(batch + (mi_in.ir.dim, mi_in.mul))
            w = params[f"w{i}_{j}"].astype(x.dtype) * self._alpha[j]
            y = jnp.matmul(c, w, preferred_element_type=x.dtype)
            prev = out_chunks[j]
            out_chunks[j] = y if prev is None else prev + y

        pieces = []
        for mi, c in zip(self.irreps_out, out_chunks):
            if c is None:
                pieces.append(jnp.zeros(batch + (mi.dim,), dtype=x.dtype))
            else:
                pieces.append(c.reshape(batch + (mi.dim,)))
        return jnp.concatenate(pieces, axis=-1)
