"""Two-body spherical-harmonic tensor embedding.

Role of the reference ``TwoBodySphericalHarmonicTensorEmbed``
(``allegro/nn/tensorembed.py:85-96``): project edge unit vectors onto real
spherical harmonics ("component" normalization) to form the tensor *basis*
(``EDGE_ATTRS``, multiplicity 1), and weight that basis into ``mul`` channels
with per-edge weights linearly projected from the scalar embedding to form the
initial tensor *features* (``EDGE_FEATURES`` in strided ``[E, mul, dim]``
layout).

Geometry/SH math runs in the positions' dtype (float64 on x64 hosts,
mirroring ``tensorembed.py:83,92``) then casts to the model dtype.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ..data import keys
from ..lib.irreps import Irreps
from ..lib.spherical_harmonics import spherical_harmonics
from .channels import MakeWeightedChannels
from .edge_geometry import with_edge_vectors
from .mlp import ScalarMLP


class TwoBodySphericalHarmonicTensorEmbed(nn.Module):
    irreps_sh: str  # e.g. "1x0e+1x1o+1x2e"
    mul: int  # num_tensor_features
    param_dtype: jnp.dtype = jnp.float32
    # "strided": EDGE_FEATURES as [E, mul, dim] (einsum/pallas backends);
    # "flat_dim_major": [E, dim*mul] — the fused kernels' layout, built
    # directly (no transpose of the biggest per-edge array on the hot path)
    features_layout: str = "strided"
    # storage dtype of EDGE_FEATURES (mixed-precision mode): cast INSIDE the
    # producing elementwise op so no f32 [E, dim*mul] array ever materializes
    tensor_dtype: str | None = None

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        irreps = Irreps(self.irreps_sh)
        data = with_edge_vectors(data)
        vec = data[keys.EDGE_VECTORS]
        ls = [mi.ir.l for mi in irreps]
        sh = spherical_harmonics(ls, vec, normalize=True).astype(self.param_dtype)
        weighter = MakeWeightedChannels(irreps, self.mul, weight_individual_irreps=True)
        weights = ScalarMLP(
            weighter.weight_numel, hidden_dims=(), name="env_embed_linear",
            param_dtype=self.param_dtype,
        )(data[keys.EDGE_EMBEDDING])
        out = dict(data)
        out[keys.EDGE_ATTRS] = sh
        # factor form for the embed-fused layer-0 kernel (mega path): the
        # [E, n_irr*mul] weights alone; under jit the expanded EDGE_FEATURES
        # below is dead code there and costs nothing
        out[keys.EDGE_FEATURE_WEIGHTS] = weights
        # padded edges: weights are exactly 0 (zero embedding through a
        # bias-free linear), so features vanish there
        if self.features_layout == "flat_dim_major":
            build = weighter.flat_dim_major
        else:
            build = weighter

        def _features(sh_, weights_):
            feats = build(sh_, weights_)
            if self.tensor_dtype is not None:
                feats = feats.astype(jnp.dtype(self.tensor_dtype))
            return feats

        # checkpoint: the product's VJP would otherwise keep BOTH expanded
        # [E, dim*mul] f32 operands alive as residuals (2 x 3.5 GB at 2.4M
        # edges) — recompute them from the small sh/weights instead
        import jax

        out[keys.EDGE_FEATURES] = jax.checkpoint(_features)(sh, weights)
        return out
