"""Per-class smooth spline over normalized edge length.

Role of the reference ``PerClassSpline`` (``allegro/nn/spline.py``): a learned
function of the normalized length, with independent weights per class (edge
type), built from smooth finite-support cosine bumps so the function and its
derivative vanish at the outer grid edge (cutoff behavior for free).

TPU-first formulation: evaluating the basis is a closed-form vectorized
expression and the per-class weight lookup is a gather + batched matmul —
no host control flow, static shapes.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp


def spline_basis(x, num_splines: int, span: float = 1.0):
    """Smooth bump basis on [0, span]: [..., num_splines].

    Bump k is centered at ``k * h`` (h = span/(num_splines-1)) with support
    ``|x - c_k| < 2h``: ``b_k(x) = 0.25 * (1 + cos(pi t / 2))**2`` with
    ``t = (x - c_k)/h`` — C^1-smooth, zero outside its support. The basis is
    scaled by a constant so ``sum_k b_k(x)^2 ≈ 1`` on the grid interior, which
    makes unit-variance weights give unit-variance outputs (the forward
    normalization the reference achieves with its init bound,
    ``allegro/nn/scalarembed.py:139-145``).
    """
    x = jnp.asarray(x)
    h = span / (num_splines - 1)
    centers = jnp.arange(num_splines, dtype=x.dtype) * h
    t = (x[..., None] - centers) / h
    b = jnp.where(jnp.abs(t) < 2.0, 0.25 * (1.0 + jnp.cos(jnp.pi * t / 2.0)) ** 2, 0.0)
    # interior normalization constant: mean of sum_k b_k^2 over the grid
    xs = np.linspace(0.25 * span, 0.75 * span, 101)
    tt = (xs[:, None] - np.arange(num_splines) * (span / (num_splines - 1))) / (
        span / (num_splines - 1)
    )
    bb = np.where(np.abs(tt) < 2.0, 0.25 * (1.0 + np.cos(np.pi * tt / 2.0)) ** 2, 0.0)
    norm = float(np.sqrt((bb**2).sum(axis=1).mean()))
    return b / norm


class PerClassSpline(nn.Module):
    """``(x [E], class_idx [E]) -> [E, channels]`` learned spline per class."""

    num_classes: int
    channels: int
    num_splines: int = 8
    span: float = 1.0
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, class_idx):
        w = self.param(
            "spline_weights",
            lambda key, s, d: jax.random.uniform(key, s, d, -np.sqrt(3.0), np.sqrt(3.0)),
            (self.num_classes, self.channels, self.num_splines),
            self.param_dtype,
        )
        basis = spline_basis(x, self.num_splines, self.span)  # [E, K]
        w_e = jnp.take(w, class_idx, axis=0).astype(basis.dtype)  # [E, C, K]
        return jnp.einsum("ek,eck->ec", basis, w_e)
