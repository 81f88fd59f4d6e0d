"""Radial basis and cutoff envelopes.

Covers the embedding substrate the reference consumes from nequip
(``allegro/nn/scalarembed.py:10``): ``PolynomialCutoff`` and Bessel edge-length
encoding. The polynomial envelope is exactly zero for ``r >= r_max``, which is
what makes padded edges (masked anyway) and just-out-of-cutoff edges
contribute nothing smoothly.
"""

from __future__ import annotations

import jax.numpy as jnp


class PolynomialCutoff:
    """Smooth polynomial envelope ``f(u)`` on ``u = r/r_max ∈ [0, 1]``.

    ``f(0)=1``, ``f(1)=0`` with ``p``-th order flatness at both ends
    (DimeNet-style envelope; the reference default is ``p=6``,
    ``allegro/model/allegro_models.py:275-277``).
    """

    def __init__(self, p: int = 6):
        self.p = int(p)

    def __call__(self, u):
        p = float(self.p)
        u = jnp.clip(u, 0.0, 1.0)
        out = (
            1.0
            - ((p + 1.0) * (p + 2.0) / 2.0) * u**p
            + p * (p + 2.0) * u ** (p + 1.0)
            - (p * (p + 1.0) / 2.0) * u ** (p + 2.0)
        )
        return out


def bessel_basis(u, num_bessels: int, eps: float = 1e-10):
    """Spherical-Bessel radial basis on normalized length ``u = r/r_max``.

    ``b_n(u) = sqrt(2) * sin(n π u) / u`` for ``n = 1..num_bessels`` — the
    standard nequip Bessel encoding up to the fixed ``1/r_max`` scale (absorbed
    by the following learned linear layer). Safe at ``u=0`` (padded edges):
    ``sin(nπu)/u → nπ`` — finite, and masked downstream anyway.
    """
    u = jnp.asarray(u)
    n = jnp.arange(1, num_bessels + 1, dtype=u.dtype) * jnp.pi
    x = u[..., None] * n
    safe_u = jnp.where(jnp.abs(u) < eps, eps, u)[..., None]
    out = jnp.where(
        jnp.abs(u)[..., None] < eps,
        n,  # limit of sin(n pi u)/u as u->0
        jnp.sin(x) / safe_u,
    )
    return jnp.sqrt(2.0).astype(u.dtype) * out
