import numpy as np

from allegro_tpu.data import keys
from allegro_tpu.data.neighborlist import neighbor_list, primitive_neighbor_list


def _brute_force(pos, r_max, cell=None, pbc=(False,) * 3, max_rep=3):
    n = len(pos)
    edges = set()
    pbc = np.asarray(pbc, dtype=bool)
    if cell is None or not pbc.any():
        shift_list = [np.zeros(3)]
    else:
        rr = [range(-max_rep, max_rep + 1) if p else [0] for p in pbc]
        shift_list = [np.array(s, dtype=float) for s in np.stack(np.meshgrid(*rr, indexing="ij"), -1).reshape(-1, 3)]
    c = np.zeros((3, 3)) if cell is None else np.asarray(cell)
    for i in range(n):
        for j in range(n):
            for s in shift_list:
                if i == j and not s.any():
                    continue
                d = np.linalg.norm(pos[j] - pos[i] + s @ c)
                if d < r_max:
                    edges.add((i, j, tuple(s.astype(int))))
    return edges


def test_open_boundary_vs_brute(rng):
    pos = rng.rand(30, 3) * 5.0
    i, j, s = primitive_neighbor_list(pos, 1.5)
    got = {(int(a), int(b), tuple(ss.astype(int))) for a, b, ss in zip(i, j, s)}
    assert got == _brute_force(pos, 1.5)


def test_periodic_cubic_vs_brute(rng):
    pos = rng.rand(20, 3) * 4.0
    cell = np.eye(3) * 4.0
    i, j, s = primitive_neighbor_list(pos, 1.8, cell, (True,) * 3)
    got = {(int(a), int(b), tuple(ss.astype(int))) for a, b, ss in zip(i, j, s)}
    assert got == _brute_force(pos, 1.8, cell, (True,) * 3)


def test_periodic_triclinic_vs_brute(rng):
    cell = np.array([[3.0, 0, 0], [0.9, 3.2, 0], [0.4, -0.7, 2.8]])
    frac = rng.rand(15, 3)
    pos = frac @ cell
    i, j, s = primitive_neighbor_list(pos, 1.6, cell, (True, True, True))
    got = {(int(a), int(b), tuple(ss.astype(int))) for a, b, ss in zip(i, j, s)}
    assert got == _brute_force(pos, 1.6, cell, (True,) * 3)


def test_mixed_pbc(rng):
    cell = np.eye(3) * 3.0
    pos = rng.rand(12, 3) * 3.0
    i, j, s = primitive_neighbor_list(pos, 1.4, cell, (True, False, True))
    got = {(int(a), int(b), tuple(ss.astype(int))) for a, b, ss in zip(i, j, s)}
    assert got == _brute_force(pos, 1.4, cell, (True, False, True))


def test_small_cell_needs_multiple_images():
    # one atom in a tiny cell: all neighbors are its own periodic images
    pos = np.zeros((1, 3))
    cell = np.eye(3) * 1.0
    i, j, s = primitive_neighbor_list(pos, 2.05, cell, (True,) * 3)
    assert (i == 0).all() and (j == 0).all()
    # shells: 6 at r=1, 12 at sqrt2, 8 at sqrt3, 6 at r=2
    assert len(i) == 6 + 12 + 8 + 6


def test_per_edge_type_cutoff(rng):
    pos = rng.rand(20, 3) * 3.0
    types = rng.randint(0, 2, 20).astype(np.int32)
    cut = np.array([[1.0, 0.5], [0.5, 1.0]])
    fr = {keys.POSITIONS: pos, keys.ATOM_TYPES: types}
    out = neighbor_list(fr, 1.0, per_edge_type_cutoff=cut)
    i, j = out[keys.EDGE_INDEX]
    r = np.linalg.norm(pos[j] - pos[i], axis=1)
    assert (r < cut[types[i], types[j]]).all()
    # symmetric matrix → both directions present
    got = set(zip(i.tolist(), j.tolist()))
    assert all((b, a) in got for a, b in got)
