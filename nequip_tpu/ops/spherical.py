"""Real spherical harmonics, generated as exact Cartesian polynomial tables.

TPU-native replacement for e3nn's ``o3.SphericalHarmonics`` (used by the
reference at ``/root/reference/nequip/nn/embedding/_edge.py:153-198``).

Instead of codegen'd per-l kernels, every ``Y_{l,m}`` is a homogeneous
polynomial of degree ``l`` in the components of the (unit) input vector.  We
generate the exact polynomial coefficient tables once on the host with sympy
(rational arithmetic, exact sphere-average normalization), then evaluation on
device is a single ``[E, n_monomials] @ [n_monomials, sh_dim]`` matmul — which
XLA maps straight onto the MXU and fuses with neighboring elementwise work.

Conventions:
* basis order within each l is m = -l..l,
* the l=1 irrep is exactly ``(y, z, x)`` (the same basis convention e3nn
  uses, so downstream geometry is familiar),
* "component" normalization: ``mean_{unit v}[Y_{l,m}(v)^2] = 1``, i.e.
  ``sum_m Y_{l,m}(v)^2 = 2l+1`` for any unit ``v`` — matching
  ``edge_sh_normalization="component"`` in the reference.

All Wigner-D matrices and Clebsch-Gordan tensors elsewhere in this package are
*derived from these polynomials*, so the whole framework is self-consistent by
construction (see ``nequip_tpu/ops/cg.py``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

import jax.numpy as jnp


def _double_factorial(n: int) -> int:
    out = 1
    while n > 1:
        out *= n
        n -= 2
    return out


def _monomials(degree: int) -> List[Tuple[int, int, int]]:
    """All (i, j, k) with i+j+k == degree, in deterministic lexicographic order."""
    return [
        (i, j, degree - i - j)
        for i in range(degree, -1, -1)
        for j in range(degree - i, -1, -1)
    ]


@lru_cache(maxsize=None)
def _sh_coeff_tables(lmax: int) -> Tuple[Tuple[Tuple[int, int, int], ...], np.ndarray]:
    """Exact SH polynomial coefficients.

    Returns ``(monomials, coeffs)`` where ``monomials`` is the concatenated
    monomial list for degrees 0..lmax and ``coeffs`` has shape
    ``(n_monomials, sum_l (2l+1))`` — block diagonal by degree — such that
    ``Y(v) = monomials(v) @ coeffs``.
    """
    import sympy as sp

    x, y, z = sp.symbols("x y z")
    r2 = x * x + y * y + z * z

    # sectoral parts: C_m = Re((x+iy)^m), S_m = Im((x+iy)^m)
    C = [sp.Integer(1)]
    S = [sp.Integer(0)]
    for m in range(1, lmax + 1):
        C.append(sp.expand(x * C[m - 1] - y * S[m - 1]))
        S.append(sp.expand(x * S[m - 1] + y * C[m - 1]))

    # associated-Legendre-like polynomials P[l][m] in (z, r2); the sin^m(theta)
    # prefactor lives in C_m / S_m.  Standard recurrences:
    #   P[m][m]   = (2m-1)!!
    #   P[m+1][m] = (2m+1) z P[m][m]
    #   (l-m) P[l][m] = (2l-1) z P[l-1][m] - (l-1+m) r2 P[l-2][m]
    P = [[None] * (lmax + 1) for _ in range(lmax + 1)]
    for m in range(lmax + 1):
        P[m][m] = sp.Integer(_double_factorial(2 * m - 1))
        if m + 1 <= lmax:
            P[m + 1][m] = sp.expand((2 * m + 1) * z * P[m][m])
        for l in range(m + 2, lmax + 1):
            P[l][m] = sp.expand(
                ((2 * l - 1) * z * P[l - 1][m] - (l - 1 + m) * r2 * P[l - 2][m])
                / (l - m)
            )

    def _poly_terms(poly):
        """[( (a, b, c), coeff ), ...] with exact coefficients (incl. radicals)."""
        poly = sp.expand(poly)
        if poly == 0:
            return []
        return [
            ((int(a), int(b), int(c)), coeff)
            for (a, b, c), coeff in sp.Poly(poly, x, y, z).terms()
        ]

    def sphere_average(poly) -> sp.Rational:
        """Exact mean of a polynomial over the unit sphere."""
        total = sp.Integer(0)
        for (a, b, c), coeff in _poly_terms(poly):
            if a % 2 or b % 2 or c % 2:
                continue
            n = a + b + c
            total += (
                coeff
                * _double_factorial(a - 1)
                * _double_factorial(b - 1)
                * _double_factorial(c - 1)
                / sp.Integer(_double_factorial(n + 1))
            )
        return total

    monomials: List[Tuple[int, int, int]] = []
    blocks: List[np.ndarray] = []
    col_polys: List[List] = []
    for l in range(lmax + 1):
        mons = _monomials(l)
        monomials.extend(mons)
        # m = -l..l : [S_l..S_1, P_l0, C_1..C_l] with the Legendre part
        polys = []
        for m in range(-l, l + 1):
            am = abs(m)
            if m < 0:
                p = P[l][am] * S[am]
            elif m == 0:
                p = P[l][0]
            else:
                p = P[l][am] * C[am]
            # restrict to the sphere: replace r2 by 1 wherever it appears.
            # P[l][m] is a polynomial in z and r2 of homogeneous degree l-|m|
            # only when counting r2 as degree 2; expanding and substituting
            # r2 -> 1 is the on-sphere value; we then re-homogenize below.
            p = sp.expand(p)
            norm2 = sphere_average(p * p)
            p = p / sp.sqrt(norm2)
            polys.append(sp.expand(p))
        col_polys.append(polys)

        # re-homogenize on-sphere polynomials to degree l (multiply lower-degree
        # terms by powers of r2): each poly has terms of degree l, l-2, l-4...
        coeff_block = np.zeros((len(mons), 2 * l + 1), dtype=np.float64)
        mon_index = {m: i for i, m in enumerate(mons)}
        for col, p in enumerate(polys):
            for (a, b, c), coeff in _poly_terms(p):
                deg = a + b + c
                deficit = l - deg
                assert deficit >= 0 and deficit % 2 == 0, (l, col, (a, b, c))
                k = deficit // 2
                cf = float(coeff)
                # multiply by (x^2+y^2+z^2)^k and distribute
                for (a2, b2, c2), coeff2 in _poly_terms(r2**k):
                    coeff_block[mon_index[(a + a2, b + b2, c + c2)], col] += (
                        cf * float(coeff2)
                    )
        blocks.append(coeff_block)

    n_mon = len(monomials)
    sh_dim = sum(2 * l + 1 for l in range(lmax + 1))
    coeffs = np.zeros((n_mon, sh_dim), dtype=np.float64)
    row = 0
    col = 0
    for l, block in enumerate(blocks):
        coeffs[row : row + block.shape[0], col : col + block.shape[1]] = block
        row += block.shape[0]
        col += block.shape[1]
    return tuple(monomials), coeffs


def sh_dim(lmax: int) -> int:
    return (lmax + 1) ** 2


def _monomial_matrix_np(vecs: np.ndarray, monomials) -> np.ndarray:
    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    cols = [
        (x**i if i else 1.0) * (y**j if j else 1.0) * (z**k if k else 1.0)
        for (i, j, k) in monomials
    ]
    return np.stack([np.broadcast_to(c, x.shape) for c in cols], axis=-1)


def spherical_harmonics_np(lmax: int, vecs: np.ndarray, normalize: bool = True) -> np.ndarray:
    """Host/numpy evaluation (used for table generation and tests)."""
    vecs = np.asarray(vecs, dtype=np.float64)
    if normalize:
        n = np.linalg.norm(vecs, axis=-1, keepdims=True)
        vecs = vecs / np.where(n == 0, 1.0, n)
    monomials, coeffs = _sh_coeff_tables(lmax)
    return _monomial_matrix_np(vecs, monomials) @ coeffs


def spherical_harmonics(
    lmax: int,
    vecs: jnp.ndarray,
    normalize: bool = True,
    eps: float = 1e-30,
) -> jnp.ndarray:
    """Device evaluation: ``Y(v)`` with component normalization.

    ``vecs``: (..., 3).  Returns (..., (lmax+1)^2).

    The zero vector maps to well-defined (garbage but finite) values and has a
    finite gradient; callers mask padded edges separately (see the padding
    contract in ``nequip_tpu.data``).
    """
    monomials, coeffs_np = _sh_coeff_tables(lmax)
    coeffs = jnp.asarray(coeffs_np, dtype=vecs.dtype)
    if normalize:
        n2 = jnp.sum(vecs * vecs, axis=-1, keepdims=True)
        # double-where guard: keeps gradients finite at v = 0 (padded edges)
        safe = jnp.where(n2 > eps, n2, 1.0)
        inv = jnp.where(n2 > eps, jax_rsqrt(safe), 0.0)
        vecs = vecs * inv

    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    # iterative powers (static python loop, fused by XLA)
    max_p = lmax
    xp = [jnp.ones_like(x)]
    yp = [jnp.ones_like(y)]
    zp = [jnp.ones_like(z)]
    for _ in range(max_p):
        xp.append(xp[-1] * x)
        yp.append(yp[-1] * y)
        zp.append(zp[-1] * z)
    mon = jnp.stack([xp[i] * yp[j] * zp[k] for (i, j, k) in monomials], axis=-1)
    return jnp.matmul(mon, coeffs, preferred_element_type=vecs.dtype)


def jax_rsqrt(x):
    import jax

    return jax.lax.rsqrt(x)
