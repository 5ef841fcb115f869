"""Gated equivariant nonlinearity.

TPU-native replacement for e3nn's ``nn.Gate``
(``/root/reference/nequip/nn/convnetlayer.py:96-115``).

Input layout: ``irreps_scalars + irreps_gates + irreps_gated`` concatenated.
Output: ``act_s(scalars)  +  act_g(gates) * gated`` (gates broadcast over the
m-dimension of each gated chunk), i.e. ``irreps_scalars + irreps_gated``.

Purely elementwise — XLA fuses this into the surrounding matmuls.  Scalar
activations are second-moment normalized (see ``ops.activations``), matching
e3nn's variance convention.

The apply carries a hand-written VJP: XLA's autodiff of the chunk slicing
rebuilds the input cotangent as full-width ``pad`` + ``add_any`` chains
(~0.5 GiB/step materialized at 23k atoms in the E+F backward, StableHLO
census r3); the hand rule runs ``jax.vjp`` per chunk and reassembles with
one ``concatenate``.  Forward-mode callers use :meth:`Gate.jvp` (the
custom_vjp blocks ``jax.jvp`` — see ``ConvNetLayer._jvp_apply``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from .activations import activation_parity, normalized_activation
from .irreps import Irreps


class Gate:
    def __init__(
        self,
        irreps_scalars,
        act_scalars: Sequence[Optional[str]],
        irreps_gates,
        act_gates: Sequence[Optional[str]],
        irreps_gated,
    ):
        self.irreps_scalars = Irreps(irreps_scalars)
        self.irreps_gates = Irreps(irreps_gates)
        self.irreps_gated = Irreps(irreps_gated)
        assert len(act_scalars) == len(self.irreps_scalars)
        assert len(act_gates) == len(self.irreps_gates)
        assert self.irreps_gates.num_irreps == self.irreps_gated.num_irreps, (
            f"need one gate per gated channel: {self.irreps_gates} vs {self.irreps_gated}"
        )
        for mi, act in zip(self.irreps_scalars, act_scalars):
            assert mi.ir.l == 0
            if mi.ir.p == -1:
                assert activation_parity(act) == -1, (
                    f"odd scalars need an odd activation, got {act}"
                )
        for mi, act in zip(self.irreps_gates, act_gates):
            assert mi.ir.l == 0

        self._act_scalars = [normalized_activation(a) for a in act_scalars]
        self._act_gates = [normalized_activation(a) for a in act_gates]

        self.irreps_in = self.irreps_scalars + self.irreps_gates + self.irreps_gated
        self.irreps_out = (self.irreps_scalars + self.irreps_gated).simplify()

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == self.irreps_in.dim, (x.shape, self.irreps_in)
        batch = x.shape[:-1]
        d_s = self.irreps_scalars.dim
        d_g = self.irreps_gates.dim

        scalars = x[..., :d_s]
        gates = x[..., d_s : d_s + d_g]
        gated = x[..., d_s + d_g :]

        out: List[jnp.ndarray] = []
        for sl, act in zip(self.irreps_scalars.slices(), self._act_scalars):
            out.append(act(scalars[..., sl]))

        # activate gates, flatten to one channel per gated mul
        g_chunks = []
        for sl, act in zip(self.irreps_gates.slices(), self._act_gates):
            g_chunks.append(act(gates[..., sl]))
        g = jnp.concatenate(g_chunks, axis=-1) if g_chunks else gates

        off = 0
        for mi, sl in zip(self.irreps_gated, self.irreps_gated.slices()):
            chunk = gated[..., sl].reshape(batch + (mi.ir.dim, mi.mul))
            gate = g[..., off : off + mi.mul][..., None, :]
            out.append((chunk * gate).reshape(batch + (mi.dim,)))
            off += mi.mul
        return jnp.concatenate(out, axis=-1)


class NormActivation:
    """Norm-based nonlinearity: scale each irrep channel by act(||channel||).

    Mirrors e3nn's ``NormActivation`` with ``normalize=True``
    (``convnetlayer.py:117-126``): output = act(||x_u||) * x_u / ||x_u||.
    """

    def __init__(self, irreps_in, scalar_nonlinearity: str = "silu", epsilon: float = 1e-8):
        self.irreps_in = Irreps(irreps_in)
        self.irreps_out = self.irreps_in
        self._act = normalized_activation(scalar_nonlinearity)
        self._eps2 = float(epsilon) ** 2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        batch = x.shape[:-1]
        out = []
        for mi, sl in zip(self.irreps_in, self.irreps_in.slices()):
            chunk = x[..., sl].reshape(batch + (mi.ir.dim, mi.mul))
            n2 = jnp.maximum(jnp.sum(chunk * chunk, axis=-2, keepdims=True), self._eps2)
            n = jnp.sqrt(n2)
            out.append((chunk * (self._act(n) / n)).reshape(batch + (mi.dim,)))
        return jnp.concatenate(out, axis=-1)
