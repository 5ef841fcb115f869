"""Feature-layout converters: e3nn's mul_ir <-> this framework's ir_mul.

Parity: ``mul_ir_to_ir_mul`` / ``ir_mul_to_mul_ir``
(``/root/reference/nequip/nn/utils.py:136-177``).  Useful when importing
weights or features produced by e3nn-based models (which store each chunk as
``(mul, 2l+1)`` flattened) into this framework's channel-last layout.
"""

from __future__ import annotations

import numpy as np

from .irreps import Irreps


def mul_ir_to_ir_mul(x, irreps):
    """Convert the last axis from e3nn (mul-major) to ir_mul (m-major)."""
    irreps = Irreps(irreps)
    assert x.shape[-1] == irreps.dim
    if all(mi.mul == 1 or mi.ir.dim == 1 for mi in irreps):
        return x
    xp = np if isinstance(x, np.ndarray) else __import__("jax.numpy", fromlist=["jnp"])
    base = x.shape[:-1]
    chunks = []
    for sl, mi in zip(irreps.slices(), irreps):
        c = x[..., sl]
        if mi.mul > 1 and mi.ir.dim > 1:
            c = c.reshape(base + (mi.mul, mi.ir.dim))
            c = c.swapaxes(-1, -2).reshape(base + (mi.dim,))
        chunks.append(c)
    return xp.concatenate(chunks, axis=-1)


def ir_mul_to_mul_ir(x, irreps):
    """Convert the last axis from ir_mul (m-major) to e3nn (mul-major)."""
    irreps = Irreps(irreps)
    assert x.shape[-1] == irreps.dim
    if all(mi.mul == 1 or mi.ir.dim == 1 for mi in irreps):
        return x
    xp = np if isinstance(x, np.ndarray) else __import__("jax.numpy", fromlist=["jnp"])
    base = x.shape[:-1]
    chunks = []
    for sl, mi in zip(irreps.slices(), irreps):
        c = x[..., sl]
        if mi.mul > 1 and mi.ir.dim > 1:
            c = c.reshape(base + (mi.ir.dim, mi.mul))
            c = c.swapaxes(-1, -2).reshape(base + (mi.dim,))
        chunks.append(c)
    return xp.concatenate(chunks, axis=-1)
