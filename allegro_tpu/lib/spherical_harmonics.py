"""Real spherical harmonics as homogeneous polynomials in (x, y, z).

Replaces ``e3nn.o3.SphericalHarmonics`` as consumed by the reference at
``allegro/nn/tensorembed.py:5,55-57,92`` (normalize=True, "component"
normalization).

Conventions (fixed here, validated in ``tests/lib/test_spherical_harmonics.py``):

- Basis order within degree ``l`` is ``m = -l..l``.
- "component" normalization: ``mean_{unit sphere} Y_lm^2 = 1``, i.e.
  ``|Y^l(x)|^2 = 2l+1`` for unit ``x``. In particular
  ``Y^1(x) = sqrt(3) * (y, z, x)``.
- Real-SH phase: ``Y_{l,m>0} ∝ P_l^m(cos θ) cos(mφ)``,
  ``Y_{l,m<0} ∝ P_l^|m|(cos θ) sin(|m|φ)``, with the Condon–Shortley phase
  cancelled (all-positive convention).

Each ``Y_lm`` restricted to the unit sphere extends uniquely to a homogeneous
polynomial of degree ``l``; we fit its monomial coefficients once on the host
in float64 (exact to machine precision since the function *is* such a
polynomial) and evaluate on device as small dense ``monomials @ coeffs``
matmuls — static shapes, fully fusable by XLA, no trig on the hot path.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp


def monomial_exponents(l: int) -> List[Tuple[int, int, int]]:
    """Deterministic ordering of the degree-``l`` monomials x^a y^b z^c."""
    return [(a, b, l - a - b) for a in range(l, -1, -1) for b in range(l - a, -1, -1)]


def _real_sh_numeric(l: int, xyz: np.ndarray) -> np.ndarray:
    """Reference real SH values on unit vectors, shape [N, 2l+1], float64.

    Direct associated-Legendre construction; used only on the host to fit the
    polynomial coefficient tables.
    """
    from scipy.special import lpmv

    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    ct = np.clip(z, -1.0, 1.0)
    phi = np.arctan2(y, x)
    out = np.zeros((xyz.shape[0], 2 * l + 1))
    for m in range(0, l + 1):
        # lpmv includes the Condon–Shortley (-1)^m; cancel it for the
        # all-positive real-SH convention.
        plm = lpmv(m, l, ct) * ((-1.0) ** m)
        nrm = np.sqrt(
            (2 * l + 1) * float(math.factorial(l - m)) / float(math.factorial(l + m))
        )
        if m == 0:
            out[:, l] = nrm * plm
        else:
            out[:, l + m] = np.sqrt(2.0) * nrm * plm * np.cos(m * phi)
            out[:, l - m] = np.sqrt(2.0) * nrm * plm * np.sin(m * phi)
    return out


@functools.lru_cache(maxsize=None)
def sh_coefficients(l: int) -> np.ndarray:
    """Monomial coefficients of degree-``l`` real SH: [n_monomials(l), 2l+1].

    ``Y^l(x) = monomials_l(x) @ sh_coefficients(l)`` exactly for unit ``x``.
    """
    if l == 0:
        return np.ones((1, 1))
    exps = monomial_exponents(l)
    rng = np.random.RandomState(12345 + l)
    n = 8 * len(exps) + 32
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    A = np.stack([v[:, 0] ** a * v[:, 1] ** b * v[:, 2] ** c for a, b, c in exps], axis=1)
    B = _real_sh_numeric(l, v)
    coeffs, res, _, _ = np.linalg.lstsq(A, B, rcond=None)
    # The fit must be exact (SH *are* homogeneous polynomials on the sphere).
    resid = np.abs(A @ coeffs - B).max()
    assert resid < 1e-10, f"SH polynomial fit failed for l={l}: resid={resid}"
    coeffs[np.abs(coeffs) < 1e-12] = 0.0
    return coeffs


def _monomials(x, y, z, lmax: int) -> List:
    """All monomial arrays per degree: list over l of [..., n_monomials(l)]."""
    # Powers up to lmax for each coordinate.
    xs = [jnp.ones_like(x)]
    ys = [jnp.ones_like(y)]
    zs = [jnp.ones_like(z)]
    for _ in range(lmax):
        xs.append(xs[-1] * x)
        ys.append(ys[-1] * y)
        zs.append(zs[-1] * z)
    out = []
    for l in range(lmax + 1):
        cols = [xs[a] * ys[b] * zs[c] for (a, b, c) in monomial_exponents(l)]
        out.append(jnp.stack(cols, axis=-1))
    return out


def spherical_harmonics(
    ls: Union[int, Sequence[int]],
    vectors,
    normalize: bool = True,
    eps: float = 1e-12,
):
    """Real spherical harmonics of ``vectors`` for the given degrees.

    Args:
      ls: an int ``lmax`` (degrees ``0..lmax``) or an explicit list of degrees.
      vectors: [..., 3] array.
      normalize: normalize vectors to unit length first (the reference always
        does: ``allegro/nn/tensorembed.py:55-57``). Zero vectors (padding) map
        to zero output for ``l>0`` and the constant for ``l=0``.

    Returns:
      [..., sum(2l+1)] array, degrees concatenated in the given order, each
      block ordered ``m=-l..l``, "component" normalization.
    """
    if isinstance(ls, int):
        ls = list(range(ls + 1))
    ls = list(ls)
    lmax = max(ls) if ls else 0
    v = jnp.asarray(vectors)
    dtype = v.dtype
    if normalize:
        n2 = jnp.sum(v * v, axis=-1, keepdims=True)
        # Padded zero-vectors: keep direction zero; l=0 output is constant
        # anyway and l>0 outputs vanish.
        v = v * jnp.where(n2 > eps, 1.0 / jnp.sqrt(jnp.maximum(n2, eps)), 0.0).astype(dtype)
    monos = _monomials(v[..., 0], v[..., 1], v[..., 2], lmax)
    blocks = []
    for l in ls:
        coeffs = jnp.asarray(sh_coefficients(l), dtype=dtype)
        blocks.append(jnp.matmul(monos[l], coeffs, precision="highest"))
    return jnp.concatenate(blocks, axis=-1)
