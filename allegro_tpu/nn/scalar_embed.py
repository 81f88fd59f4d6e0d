"""Two-body radial × chemistry scalar embeddings.

The two interchangeable embeddings the reference selects by config
(``allegro/nn/scalarembed.py``, SURVEY.md C9):

- ``TwoBodyBesselScalarEmbed``: Bessel radial encoding × polynomial cutoff,
  times a product-of-type-embeddings chemistry factor
  (``ProductTypeEmbedding``, ``allegro/nn/_edgeembed.py:49-84``).
- ``TwoBodySplineScalarEmbed``: a per-edge-type learned spline of the
  normalized length (``allegro/nn/scalarembed.py:159-174``).

Both write ``EDGE_EMBEDDING`` (and ``EDGE_CUTOFF``), multiplied by
``EDGE_MASK`` — the masking that keeps every padded edge identically zero
through the whole network (see ``allegro_tpu/data/atomic_data.py``).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data import keys
from .cutoffs import PolynomialCutoff, bessel_basis
from .mlp import ScalarMLP
from .spline import PerClassSpline


def _edge_mask(data: Dict, like) -> jnp.ndarray:
    if keys.EDGE_MASK in data:
        return data[keys.EDGE_MASK].astype(like.dtype)[:, None]
    return jnp.ones((like.shape[0], 1), dtype=like.dtype)


class OneHotEmbed(nn.Module):
    """``nn.Embed`` drop-in (same param path/shape/init) that looks rows up
    with a one-hot MXU matmul instead of a gather: TPU row gathers cost
    ~0.15 ms per [E]-gather at production edge counts (near-scalar DMA), a
    one-hot [E, T] @ [T, D] matmul is fully pipelined. Exact: each one-hot
    row selects a single table row (no accumulation), done at HIGHEST so the
    table values are never rounded to bf16."""

    num_embeddings: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, indices):
        table = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
            (self.num_embeddings, self.features),
            self.param_dtype,
        )
        onehot = jax.nn.one_hot(indices, self.num_embeddings, dtype=table.dtype)
        return jnp.dot(onehot, table, precision="highest")


class ProductTypeEmbedding(nn.Module):
    """Chemistry × radial product embedding
    (role of the reference's ``ProductTypeEmbedding``,
    ``allegro/nn/_edgeembed.py:49-84``): separate center/neighbor type
    embeddings of dim/2 each, concatenated, times a linear projection of the
    radial basis."""

    num_types: int
    dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, radial_basis, center_types, neighbor_types):
        half = self.dim // 2
        assert 2 * half == self.dim, "embedding dim must be even"
        dtype = self.param_dtype
        radial_proj = ScalarMLP(
            self.dim, hidden_dims=(), name="radial_proj", param_dtype=dtype
        )(radial_basis)
        center_embed = OneHotEmbed(
            self.num_types, half, name="center_type_embed", param_dtype=dtype
        )
        neighbor_embed = OneHotEmbed(
            self.num_types, half, name="neighbor_type_embed", param_dtype=dtype
        )
        chem = jnp.concatenate(
            [center_embed(center_types), neighbor_embed(neighbor_types)], axis=-1
        )
        return radial_proj * chem


class TwoBodyBesselScalarEmbed(nn.Module):
    """Bessel(norm_length) × cutoff → ProductTypeEmbedding."""

    num_types: int
    output_dim: int = 64
    num_bessels: int = 8
    polynomial_cutoff_p: int = 6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        u = data[keys.NORM_LENGTH][:, 0]
        dtype = self.param_dtype
        cutoff = PolynomialCutoff(self.polynomial_cutoff_p)(u)[:, None].astype(dtype)
        radial = bessel_basis(u, self.num_bessels).astype(dtype) * cutoff
        if keys.EDGE_TYPE in data:
            # precomputed per neighbor list (Model.precompute_statics):
            # derive center/neighbor types with a divmod instead of two
            # per-edge type gathers (~1.4 ms/step at production edge counts)
            et = data[keys.EDGE_TYPE]
            ct, nt = et // self.num_types, et % self.num_types
        else:
            centers, neighbors = data[keys.EDGE_INDEX][0], data[keys.EDGE_INDEX][1]
            types = data[keys.ATOM_TYPES]
            ct = jnp.take(types, centers, mode="clip")
            nt = jnp.take(types, neighbors, mode="clip")
        emb = ProductTypeEmbedding(
            num_types=self.num_types, dim=self.output_dim, param_dtype=dtype,
            name="product_type_embed",
        )(radial, ct, nt)
        out = dict(data)
        mask = _edge_mask(data, emb)
        out[keys.EDGE_CUTOFF] = cutoff * mask
        out[keys.EDGE_EMBEDDING] = emb * mask
        return out


class TwoBodySplineScalarEmbed(nn.Module):
    """Per-edge-type spline of normalized length → EDGE_EMBEDDING.

    Reference parity (``allegro/nn/scalarembed.py:84-175``): the spline basis
    itself vanishes smoothly at the cutoff (``u = 1``), so the embedding needs
    no extra cutoff envelope — MD energies stay continuous across
    re-neighboring. ``spline_span`` is the reference's integer overlap count
    (reference defaults ``num_splines=16, spline_span=12``; its tests use
    ``8 / 6``). ``EDGE_CUTOFF`` is still attached for downstream consumers
    (ZBL pair potential — the reference adds it via ``AddRadialCutoffToData``
    only in that case, ``allegro/model/allegro_models.py:270-288``)."""

    num_types: int
    output_dim: int = 64
    num_splines: int = 16
    spline_span: int = 12
    polynomial_cutoff_p: int = 6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Dict) -> Dict:
        # spline math in the geometry dtype (float64 on x64 hosts, mirroring
        # the reference _GLOBAL_DTYPE policy), cast to model dtype at the end
        u = data[keys.NORM_LENGTH][:, 0]
        edge_type = data[keys.EDGE_TYPE]
        emb = PerClassSpline(
            num_classes=self.num_types * self.num_types,
            channels=self.output_dim,
            num_splines=self.num_splines,
            spline_span=int(self.spline_span),
            name="spline",
            param_dtype=self.param_dtype,
        )(u, edge_type).astype(self.param_dtype)
        out = dict(data)
        mask = _edge_mask(data, emb)
        cutoff = PolynomialCutoff(self.polynomial_cutoff_p)(u)[:, None].astype(emb.dtype)
        out[keys.EDGE_CUTOFF] = cutoff * mask
        out[keys.EDGE_EMBEDDING] = emb * mask
        return out
