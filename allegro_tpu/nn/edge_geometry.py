"""Edge geometry: vectors, lengths, normalized lengths, edge types.

Covers nequip's ``with_edge_vectors_`` and ``EdgeLengthNormalizer`` as
consumed by the reference (``allegro/nn/tensorembed.py:9,86``,
``allegro/model/allegro_models.py:153-157``).

Geometry is computed in the dtype of the incoming positions — float64 on host
CPU paths when x64 is enabled (mirroring the reference's ``_GLOBAL_DTYPE``
split, ``allegro/nn/spline.py:5,27``), float32 on TPU — and cast to the model
dtype downstream.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..data import keys


def with_edge_vectors(data: Dict, recompute: bool = False) -> Dict:
    """Attach EDGE_VECTORS/EDGE_LENGTH: ``r_ij = pos[j] - pos[i] + shift @ cell``."""
    if not recompute and keys.EDGE_VECTORS in data and keys.EDGE_LENGTH in data:
        return data
    pos = data[keys.POSITIONS]
    centers, neighbors = data[keys.EDGE_INDEX][0], data[keys.EDGE_INDEX][1]
    E = centers.shape[0]
    if keys.FUSED_OFFS in data and keys.CENTER_RANK_IDENTITY in data:
        # centers are sorted with the identity rank map: gather center
        # positions (and, in the VJP, scatter-add the center-side force
        # contributions) through the rank-window Pallas kernels — XLA's TPU
        # row scatter costs ~0.9 ms at production edge counts, the kernel
        # ~0.1 ms. Closed under transposition (force training AD-safe).
        from ..ops.fused_primitives import center_gather

        # center ops put windows on the LANE axis — always the classic
        # (wr = eb) plan; the twin keys carry it when FUSED_WR is armed
        if keys.FUSED_OFFS_EB in data:
            offs, win = data[keys.FUSED_OFFS_EB], data[keys.FUSED_WIN_EB]
        else:
            offs, win = data[keys.FUSED_OFFS], data[keys.FUSED_WIN]
        eb = offs.shape[1]
        Ep = offs.shape[0] // 8 * eb
        # passes=3: POSITION gathers must be exact — a dropped one-hot split
        # term puts ~2^-17·|cell| of noise on every edge vector, which is
        # what capped the 2-pass headline parity at ~1.6e-4 rel in round 3
        pos_c = center_gather(pos, offs, win, eb=eb, n_edges=Ep, passes=3)[:E]
        if keys.NBR_RANK_IDENTITY in data and keys.FUSED_OFFS_NBR in data:
            # neighbor side through the kernels too, via the static
            # neighbor-sort permutation: the VJP becomes perm-take +
            # rank-window scatter instead of an XLA row scatter-add
            # (~0.7 ms/step at production edge counts)
            from ..ops.fused_primitives import perm_rows

            offs2, win2 = data[keys.FUSED_OFFS_NBR], data[keys.FUSED_WIN_NBR]
            pos_n_sorted = center_gather(
                pos, offs2, win2, eb=eb, n_edges=Ep, passes=3
            )
            pos_n = perm_rows(
                pos_n_sorted, data[keys.NBR_PERM_INV], data[keys.NBR_PERM]
            )[:E].astype(pos.dtype)
        else:
            pos_n = jnp.take(pos, neighbors, axis=0, mode="clip")
        vec = pos_n - pos_c.astype(pos.dtype)
        if keys.EDGE_MASK in data:
            # padded (sentinel-center) edges read a zero rank row, so restore
            # the vec == 0 invariant the take-based path gets from clipping
            vec = vec * data[keys.EDGE_MASK].astype(vec.dtype)[:, None]
    else:
        vec = jnp.take(pos, neighbors, axis=0, mode="clip") - jnp.take(
            pos, centers, axis=0, mode="clip"
        )
    if keys.CELL in data and keys.EDGE_CELL_SHIFT in data:
        cell = data[keys.CELL]
        if cell.ndim == 2:
            cell = cell[None]
        shift = data[keys.EDGE_CELL_SHIFT].astype(vec.dtype)
        if cell.shape[0] == 1 or keys.BATCH not in data:
            # single frame: no per-edge frame gather (TPU row gathers are
            # slow — measured 0.7 ms/step at production edge counts)
            vec = vec + jnp.einsum(
                "es,sr->er", shift, cell[0].astype(vec.dtype), precision="highest"
            )
        else:
            edge_frame = jnp.take(data[keys.BATCH], centers, axis=0, mode="clip")
            edge_cell = jnp.take(cell, edge_frame, axis=0)  # [E, 3, 3]
            vec = vec + jnp.einsum(
                "es,esr->er", shift, edge_cell.astype(vec.dtype), precision="highest"
            )
    out = dict(data)
    out[keys.EDGE_VECTORS] = vec
    # NaN-safe norm: padded edges have zero vectors, and d|v|/dv at v=0 is
    # NaN, which would poison force gradients even after masking. The
    # double-where keeps the gradient path finite (padded edges get r = 0).
    n2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    safe = jnp.where(n2 > 0, n2, 1.0)
    out[keys.EDGE_LENGTH] = jnp.where(n2 > 0, jnp.sqrt(safe), 0.0)
    return out


class EdgeLengthNormalizer:
    """Compute ``NORM_LENGTH = r / r_max`` (optionally per-edge-type cutoffs)
    and the flattened ``EDGE_TYPE = center_type * n_types + neighbor_type``.

    Stateless (cutoffs are static config), so a plain callable.
    """

    def __init__(
        self,
        r_max: float,
        num_types: int,
        per_edge_type_cutoff: Optional[np.ndarray] = None,
    ):
        self.r_max = float(r_max)
        self.num_types = int(num_types)
        if per_edge_type_cutoff is not None:
            cut = np.asarray(per_edge_type_cutoff, dtype=np.float64)
            assert cut.shape == (num_types, num_types)
            assert (cut <= r_max + 1e-12).all(), "per-edge-type cutoffs must be <= r_max"
            self._flat_cutoffs = cut.reshape(-1)
        else:
            self._flat_cutoffs = None

    def __call__(self, data: Dict) -> Dict:
        data = with_edge_vectors(data)
        out = dict(data)
        if keys.EDGE_TYPE in data:
            # precomputed per neighbor list (position-independent; see
            # Model.precompute_statics) — two per-edge type gathers cost
            # ~1.4 ms/step at production edge counts if redone every step
            edge_type = data[keys.EDGE_TYPE]
        else:
            centers, neighbors = data[keys.EDGE_INDEX][0], data[keys.EDGE_INDEX][1]
            types = data[keys.ATOM_TYPES]
            edge_type = jnp.take(types, centers, mode="clip") * self.num_types + jnp.take(
                types, neighbors, mode="clip"
            )
        out[keys.EDGE_TYPE] = edge_type.astype(jnp.int32)
        r = data[keys.EDGE_LENGTH]
        if self._flat_cutoffs is not None:
            rc = jnp.take(
                jnp.asarray(self._flat_cutoffs, dtype=r.dtype), out[keys.EDGE_TYPE]
            )[:, None]
            out[keys.NORM_LENGTH] = r / rc
        else:
            out[keys.NORM_LENGTH] = r / jnp.asarray(self.r_max, dtype=r.dtype)
        return out
