"""Periodic neighbor lists (host-side, NumPy/scipy).

Fills the role of nequip's ``NeighborListTransform`` consumed via config at
reference ``configs/tutorial.yaml:13-16``: given positions, an optional
triclinic cell, and periodic-boundary flags, produce directed edges
``(i=center, j=neighbor)`` with integer cell shifts such that

    r_ij = pos[j] - pos[i] + shift @ cell   and   |r_ij| < r_max.

Both edge directions are emitted (the model is per-directed-edge). Self-edges
with zero shift are excluded. Implementation: replicate atoms into the needed
shell of periodic images, then a cKDTree ball query from the central atoms —
O(N log N), adequate for host-side dataset prep and MD re-neighboring at the
scales tested here (the on-device MD path re-uses these lists with bucketed
padding so recompilation is avoided; see allegro_tpu/md).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree


def _n_repeats(cell: np.ndarray, pbc: np.ndarray, r_max: float) -> np.ndarray:
    """Number of periodic images needed per axis to cover ``r_max``."""
    reps = np.zeros(3, dtype=np.int64)
    if not pbc.any():
        return reps
    # Distance between opposite faces of the cell along axis k is
    # 1 / |row k of inv(cell)|.
    inv = np.linalg.inv(cell)
    heights = 1.0 / np.linalg.norm(inv, axis=1)
    for k in range(3):
        if pbc[k]:
            reps[k] = int(np.ceil(r_max / heights[k]))
    return reps


def primitive_neighbor_list(
    positions: np.ndarray,
    r_max: float,
    cell: Optional[np.ndarray] = None,
    pbc=(False, False, False),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Directed neighbor list.

    Uses the native C++ cell-list kernel (``csrc/neighborlist.cpp``) when a
    toolchain is available (disable with ``ALLEGRO_TPU_NATIVE=0``), else the
    scipy cKDTree implementation below. Both produce identical edge sets.

    Returns:
      centers [E] int32, neighbors [E] int32, cell_shifts [E, 3] float64
      (integer-valued; ``r = pos[j] - pos[i] + shifts @ cell``).
    """
    import os

    if os.environ.get("ALLEGRO_TPU_NATIVE", "1") != "0":
        from ..native import native_neighbor_list

        res = native_neighbor_list(positions, r_max, cell, pbc)
        if res is not None:
            return res
    positions = np.asarray(positions, dtype=np.float64)
    n = positions.shape[0]
    pbc = np.asarray(pbc, dtype=bool)
    if cell is None or not pbc.any():
        tree = cKDTree(positions)
        pairs = tree.query_pairs(r_max, output_type="ndarray")  # i<j, unique
        if pairs.size == 0:
            e = np.zeros(0, dtype=np.int32)
            return e, e.copy(), np.zeros((0, 3))
        i = np.concatenate([pairs[:, 0], pairs[:, 1]]).astype(np.int32)
        j = np.concatenate([pairs[:, 1], pairs[:, 0]]).astype(np.int32)
        return i, j, np.zeros((len(i), 3))

    cell = np.asarray(cell, dtype=np.float64).reshape(3, 3)
    reps = _n_repeats(cell, pbc, r_max)
    ranges = [np.arange(-reps[k], reps[k] + 1) for k in range(3)]
    shifts = np.stack(np.meshgrid(*ranges, indexing="ij"), axis=-1).reshape(-1, 3)
    # Put the zero shift first so self-pairs are cheap to exclude.
    order = np.argsort(np.abs(shifts).sum(axis=1), kind="stable")
    shifts = shifts[order].astype(np.float64)
    n_shift = shifts.shape[0]
    images = (positions[None, :, :] + (shifts @ cell)[:, None, :]).reshape(-1, 3)
    tree = cKDTree(images)
    neigh = tree.query_ball_point(positions, r_max)
    ci, cj, cs = [], [], []
    for i in range(n):
        idx = np.asarray(neigh[i], dtype=np.int64)
        if idx.size == 0:
            continue
        s_idx = idx // n
        j = idx % n
        keep = ~((j == i) & (s_idx == 0))
        # exact distance filter (query_ball_point is inclusive of r_max)
        j, s_idx = j[keep], s_idx[keep]
        d = np.linalg.norm(images[idx[keep]] - positions[i], axis=1)
        keep2 = d < r_max
        j, s_idx = j[keep2], s_idx[keep2]
        ci.append(np.full(len(j), i, dtype=np.int32))
        cj.append(j.astype(np.int32))
        cs.append(shifts[s_idx])
    if not ci:
        e = np.zeros(0, dtype=np.int32)
        return e, e.copy(), np.zeros((0, 3))
    return np.concatenate(ci), np.concatenate(cj), np.concatenate(cs, axis=0)


def neighbor_list(
    frame: dict,
    r_max: float,
    per_edge_type_cutoff: Optional[np.ndarray] = None,
) -> dict:
    """Attach ``EDGE_INDEX``/``EDGE_CELL_SHIFT`` to a frame dict.

    ``per_edge_type_cutoff``: optional [n_types, n_types] matrix of cutoffs
    (<= r_max); edges longer than the cutoff for their (center, neighbor) type
    pair are dropped (reference behavior: ``EdgeLengthNormalizer`` with
    ``per_edge_type_cutoff``, ``allegro/model/allegro_models.py:153-157``).
    """
    from . import keys

    pos = np.asarray(frame[keys.POSITIONS], dtype=np.float64)
    cell = frame.get(keys.CELL)
    pbc = np.asarray(frame.get(keys.PBC, (False, False, False))).reshape(-1)[-3:]
    i, j, shifts = primitive_neighbor_list(pos, r_max, cell, pbc)
    if per_edge_type_cutoff is not None and len(i):
        types = np.asarray(frame[keys.ATOM_TYPES])
        c = np.asarray(cell, dtype=np.float64).reshape(3, 3) if cell is not None else np.zeros((3, 3))
        r = np.linalg.norm(pos[j] - pos[i] + shifts @ c, axis=1)
        keep = r < per_edge_type_cutoff[types[i], types[j]]
        i, j, shifts = i[keep], j[keep], shifts[keep]
    # Canonical center-sorted edge order (reference lexsorts for its kernel
    # CSR metadata, allegro/nn/_strided/_lexsort.py): the fused Pallas kernels
    # require non-decreasing centers (rank-space block windows), and the
    # segment-sum paths benefit from sorted segment ids either way.
    if len(i):
        order = np.argsort(i, kind="stable")
        i, j, shifts = i[order], j[order], shifts[order]
    out = dict(frame)
    out[keys.EDGE_INDEX] = np.stack([i, j], axis=0)
    out[keys.EDGE_CELL_SHIFT] = shifts
    return out
