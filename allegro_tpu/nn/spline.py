"""Per-class smooth spline over normalized edge length.

Role of the reference ``PerClassSpline`` (``allegro/nn/spline.py``), with the
same basis semantics:

- ``num_splines`` = K basis functions; ``spline_span`` = s is an INTEGER — the
  number of basis functions overlapping at a grid point
  (``allegro/nn/spline.py:18,43-49``).
- Bump k has support ``[lower_k, lower_k + diff]`` with ``lower_k = (k-s)/K``
  and ``diff = (s+1)/K``; on its support
  ``b_k(x) = 0.25 * (1 - cos(2π (x - lower_k)/diff))²`` — one full cosine
  period, C¹-smooth, identically zero outside (``spline.py:83-89``).
- The last bump's support ends exactly at ``x = 1`` (``lower_{K-1} + diff =
  (K-1-s)/K + (s+1)/K = 1``), so EVERY basis function — and therefore the
  embedding — vanishes smoothly at the cutoff: no extra cutoff envelope is
  needed, and MD energies stay continuous across re-neighboring events.
- Forward-normalized init: weights ~ U(−√(3/s), √(3/s)) since ≈ s bumps
  overlap at any interior point (``allegro/nn/scalarembed.py:139-145``).

TPU-first formulation: the basis is one vectorized clip+cos expression; the
per-class weight lookup is a gather + batched contraction — static shapes, no
host control flow. Basis math runs in the input's dtype (float64 on x64 hosts,
mirroring the reference's ``_GLOBAL_DTYPE`` policy, ``spline.py:5,27``) and is
cast to the model dtype by the caller.
"""

from __future__ import annotations

import math

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp


def spline_basis(x, num_splines: int, spline_span: int):
    """Reference-parity bump basis on [0, 1]: [..., num_splines].

    ``spline_span`` is the integer overlap count (``allegro/nn/spline.py:43-49``).
    Every bump vanishes identically for x >= 1.
    """
    assert 0 <= spline_span <= num_splines, (spline_span, num_splines)
    assert num_splines > 0
    x = jnp.asarray(x)
    K, s = num_splines, int(spline_span)
    lower = (jnp.arange(K, dtype=x.dtype) - s) / K
    diff = (s + 1) / K
    const = 2.0 * math.pi / diff
    t = const * (jnp.clip(x[..., None], lower, lower + diff) - lower)
    return 0.25 * jnp.square(1.0 - jnp.cos(t))


class PerClassSpline(nn.Module):
    """``(x [E], class_idx [E]) -> [E, channels]`` learned spline per class."""

    num_classes: int
    channels: int
    num_splines: int = 16
    spline_span: int = 12
    # forward-normalized init (reference forward_weight_init=True default)
    forward_weight_init: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, class_idx):
        if self.forward_weight_init:
            bound = math.sqrt(3.0 / max(self.spline_span, 1))
        else:
            bound = math.sqrt(3.0 / self.channels)
        w = self.param(
            "spline_weights",
            lambda key, s, d: jax.random.uniform(key, s, d, -bound, bound),
            (self.num_classes, self.channels, self.num_splines),
            self.param_dtype,
        )
        basis = spline_basis(x, self.num_splines, self.spline_span)  # [E, K]
        w_e = jnp.take(w, class_idx, axis=0, mode="clip").astype(basis.dtype)
        return jnp.einsum("ek,eck->ec", basis, w_e, precision="highest")
