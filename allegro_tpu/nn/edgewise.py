"""Edge→atom scatter reductions.

Role of the reference ``EdgewiseReduce`` (``allegro/nn/edgewise.py:40-59``):
scatter-sum a per-edge field into a per-atom field over the edge centers,
with an optional static pre-scale factor for numerics (the builder passes
``1/sqrt(2*avg_num_neighbors)``, ``allegro/model/allegro_models.py:242-248``).

Padded edges carry exactly-zero fields (see scalar_embed), so the scatter is
mask-free; ``num_segments`` is the static padded atom count.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..data import keys


class EdgewiseReduce:
    """Stateless scatter reduction of ``field`` into ``out_field`` over edge
    centers; ``reduce`` ∈ {"sum", "mean"} (the reference also declares min/max
    but only sum is used by the model chain)."""

    def __init__(
        self,
        field: str = keys.EDGE_ENERGY,
        out_field: str = keys.PER_ATOM_ENERGY,
        factor: Optional[float] = None,
        reduce: str = "sum",
    ):
        assert reduce in ("sum", "mean", "min", "max"), reduce
        self.field = field
        self.out_field = out_field
        self.factor = factor
        self.reduce = reduce

    def __call__(self, data: Dict) -> Dict:
        x = data[self.field]
        if self.factor is not None:
            x = x * jnp.asarray(self.factor, dtype=x.dtype)
        n_atoms = data[keys.POSITIONS].shape[0]
        centers = data[keys.EDGE_INDEX][0]
        out = dict(data)
        if self.reduce in ("min", "max"):
            # reference EdgewiseReduce also supports min/max scatters;
            # edge-less atoms get 0 (the segment identity is ±inf)
            seg = jax.ops.segment_min if self.reduce == "min" else jax.ops.segment_max
            red = seg(x, centers, num_segments=n_atoms)
            out[self.out_field] = jnp.where(jnp.isfinite(red), red, 0.0)
            return out
        if (
            self.reduce == "sum"
            and keys.FUSED_OFFS in data
            and keys.CENTER_RANK_IDENTITY in data
        ):
            # rank-window Pallas segment-sum: its transpose (the per-atom
            # energy cotangent broadcast in the force VJP) is a window gather
            # instead of an XLA row gather (~0.7 ms/step at 100k edges)
            from ..ops.fused_primitives import center_scatter

            # center ops put windows on the LANE axis — always the classic
            # (wr = eb) plan; the twin keys carry it when FUSED_WR is armed
            if keys.FUSED_OFFS_EB in data:
                offs, win = data[keys.FUSED_OFFS_EB], data[keys.FUSED_WIN_EB]
            else:
                offs, win = data[keys.FUSED_OFFS], data[keys.FUSED_WIN]
            eb = offs.shape[1]
            Ep = offs.shape[0] // 8 * eb
            xp = jnp.pad(x, ((0, Ep - x.shape[0]), (0, 0)))
            # passes=3: per-atom ENERGY sums stay exact under any policy
            out[self.out_field] = center_scatter(
                xp, offs, win, eb=eb, n_atoms=n_atoms, passes=3
            ).astype(x.dtype)
            return out
        summed = jax.ops.segment_sum(x, centers, num_segments=n_atoms)
        if self.reduce == "mean":
            if keys.EDGE_MASK in data:
                ones = data[keys.EDGE_MASK].astype(x.dtype)
            else:
                ones = jnp.ones(x.shape[0], dtype=x.dtype)
            counts = jax.ops.segment_sum(ones, centers, num_segments=n_atoms)
            summed = summed / jnp.maximum(counts, 1.0)[:, None]
        out[self.out_field] = summed
        return out
