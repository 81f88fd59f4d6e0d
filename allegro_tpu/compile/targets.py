"""Compile targets and ghost-atom data conversion.

Reference contract (``allegro/_compile.py``): the ``pair_allegro`` target
declares inputs = (positions, edge_index, atom_types) (``:10-14``), outputs =
the MD-engine set (per-atom energy, forces, total energy), drops batch keys
(single-frame specialization, ``:24-26``), and converts PBC data into
**ghost-atom format** — every (neighbor, nonzero cell shift) pair becomes an
appended shifted copy of the atom, edges are rewired to the copies, and the
cell is dropped (``:28-63``). Forces computed on ghosts are summed back onto
their owners (what LAMMPS does over MPI; here a segment-sum).

Artifact contract note: models compiled with a ``fused``/``fused_infer``
kernel backend require ``edge_index`` **sorted by center atom** (column 0
non-decreasing), with any padding edges using a sentinel center >= n_atoms.
Every in-repo producer (``data/neighborlist.py``, the MD re-neighboring, the
C++ driver's cell-list build) emits this order; third-party integrations
feeding their own neighbor lists must sort. Unsorted input is poisoned to
NaN by the model (``nn/allegro.py``) rather than silently mis-aggregated.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from ..data import keys

MD_ENGINE_OUTPUTS = (keys.PER_ATOM_ENERGY, keys.FORCES, keys.TOTAL_ENERGY)


@dataclasses.dataclass(frozen=True)
class CompileTarget:
    name: str
    inputs: Tuple[str, ...]
    outputs: Tuple[str, ...]
    data_settings: Optional[Callable[[Dict], Dict]] = None


COMPILE_TARGETS: Dict[str, CompileTarget] = {}


def register_compile_target(target: CompileTarget) -> CompileTarget:
    COMPILE_TARGETS[target.name] = target
    return target


def ghost_atom_conversion(frame: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Convert a periodic frame to ghost-atom (open-boundary) format.

    Each distinct ``(neighbor_atom, cell_shift != 0)`` pair becomes one ghost
    atom at ``pos[j] + shift @ cell``; edges are rewired to the ghosts; CELL /
    EDGE_CELL_SHIFT are dropped. Adds ``_ghost_owner`` ([N+G] int32, the owner
    index for every row — identity for real atoms) for force collapse.
    """
    pos = np.asarray(frame[keys.POSITIONS], dtype=np.float64)
    n = pos.shape[0]
    eidx = np.asarray(frame[keys.EDGE_INDEX])
    types = np.asarray(frame[keys.ATOM_TYPES])
    shifts = np.asarray(frame.get(keys.EDGE_CELL_SHIFT))
    cell = np.asarray(frame.get(keys.CELL, np.zeros((3, 3)))).reshape(3, 3)
    if shifts is None or not np.abs(shifts).any():
        out = dict(frame)
        out.pop(keys.CELL, None)
        out.pop(keys.PBC, None)
        out.pop(keys.EDGE_CELL_SHIFT, None)
        out["_ghost_owner"] = np.arange(n, dtype=np.int32)
        return out
    sh_int = np.rint(shifts).astype(np.int64)
    is_ghost_edge = np.abs(sh_int).sum(axis=1) > 0
    # unique (neighbor, shift) pairs
    key_arr = np.stack([eidx[1], sh_int[:, 0], sh_int[:, 1], sh_int[:, 2]], axis=1)
    ghost_keys, inverse = np.unique(
        key_arr[is_ghost_edge], axis=0, return_inverse=True
    )
    g = ghost_keys.shape[0]
    owners = ghost_keys[:, 0].astype(np.int32)
    ghost_pos = pos[owners] + ghost_keys[:, 1:].astype(np.float64) @ cell
    new_neighbors = eidx[1].copy()
    new_neighbors[is_ghost_edge] = n + inverse
    out = dict(frame)
    out[keys.POSITIONS] = np.concatenate([pos, ghost_pos], axis=0)
    out[keys.ATOM_TYPES] = np.concatenate([types, types[owners]]).astype(types.dtype)
    out[keys.EDGE_INDEX] = np.stack([eidx[0], new_neighbors], axis=0).astype(np.int32)
    out["_ghost_owner"] = np.concatenate(
        [np.arange(n, dtype=np.int32), owners.astype(np.int32)]
    )
    for k in (keys.CELL, keys.PBC, keys.EDGE_CELL_SHIFT):
        out.pop(k, None)
    if keys.NODE_MASK in out:
        out[keys.NODE_MASK] = np.concatenate(
            [np.asarray(out[keys.NODE_MASK], bool), np.ones(g, bool)]
        )
    return out


def collapse_ghost_forces(forces: np.ndarray, ghost_owner: np.ndarray, n_real: int) -> np.ndarray:
    """Sum ghost-atom force contributions back onto the owning real atoms
    (the single-process template of pair_allegro's MPI force return)."""
    out = np.zeros((n_real, forces.shape[1]), dtype=forces.dtype)
    np.add.at(out, np.asarray(ghost_owner), np.asarray(forces))
    return out


def _single_frame_settings(frame: Dict) -> Dict:
    """Drop batch bookkeeping (0/1-specialization) and convert PBC to ghosts."""
    frame = dict(frame)
    for k in (keys.BATCH, keys.NUM_NODES, keys.FRAME_MASK):
        frame.pop(k, None)
    return ghost_atom_conversion(frame)


register_compile_target(
    CompileTarget(
        name="pair_allegro",
        inputs=(keys.POSITIONS, keys.EDGE_INDEX, keys.ATOM_TYPES),
        outputs=MD_ENGINE_OUTPUTS,
        data_settings=_single_frame_settings,
    )
)

# + per-frame virial (Σ rᵢ⊗fᵢ over real+ghost rows — exact in ghost format;
# stress = -virial / volume, computed by the consumer who knows the cell).
# The role of the reference's ForceStressOutput in deployment
# (allegro/model/allegro_models.py:103) / LAMMPS virial_fdotr_compute.
register_compile_target(
    CompileTarget(
        name="pair_allegro_stress",
        inputs=(keys.POSITIONS, keys.EDGE_INDEX, keys.ATOM_TYPES),
        outputs=MD_ENGINE_OUTPUTS + (keys.VIRIAL,),
        data_settings=_single_frame_settings,
    )
)
