import numpy as np

from allegro_tpu.data import (
    DataLoader,
    InMemoryDataset,
    batch_frames,
    compute_statistics,
    keys,
)
from allegro_tpu.data.datasets import synthetic_molecular_frames


def _dataset(n=6):
    return InMemoryDataset(synthetic_molecular_frames(n, n_atoms=10), r_max=2.5)


def test_batch_frames_offsets():
    ds = _dataset(3)
    b = batch_frames(ds.frames, n_atoms=40, n_edges=512, n_frames=3)
    assert b[keys.POSITIONS].shape == (40, 3)
    assert b[keys.EDGE_INDEX].shape == (2, 512)
    assert b[keys.NODE_MASK].sum() == 30
    # edges of frame 1 index into atoms 10..19
    e_mask = b[keys.EDGE_MASK]
    centers = b[keys.EDGE_INDEX][0][e_mask]
    frames_of_edges = b[keys.BATCH][centers]
    neighbors = b[keys.EDGE_INDEX][1][e_mask]
    assert (frames_of_edges == b[keys.BATCH][neighbors]).all()
    assert set(np.unique(b[keys.BATCH][b[keys.NODE_MASK]]).tolist()) == {0, 1, 2}


def test_dataloader_static_shapes():
    ds = _dataset(5)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    shapes = set()
    n_seen = 0
    for b in dl:
        shapes.add((b[keys.POSITIONS].shape, b[keys.EDGE_INDEX].shape))
        n_seen += int(b[keys.FRAME_MASK].sum())
    assert len(shapes) == 1  # one compile signature
    assert n_seen == 5


def test_statistics():
    ds = _dataset(4)
    st = compute_statistics(ds)
    assert st["num_neighbors_mean"] > 0
    assert "forces_rms" in st and st["forces_rms"] > 0
    assert "per_atom_energy_mean" in st
    # consistency: mean neighbors = total edges / total atoms
    tot_e = sum(f[keys.EDGE_INDEX].shape[1] for f in ds.frames)
    tot_a = sum(f[keys.POSITIONS].shape[0] for f in ds.frames)
    assert abs(st["num_neighbors_mean"] - tot_e / tot_a) < 1e-12


def test_batch_preserves_edge_vectors():
    ds = _dataset(2)
    b = batch_frames(ds.frames, n_atoms=32, n_edges=256, n_frames=2)
    # recompute lengths from the batched arrays and compare to per-frame
    pos, (ci, cj) = b[keys.POSITIONS], b[keys.EDGE_INDEX]
    m = b[keys.EDGE_MASK]
    r_batched = np.sort(np.linalg.norm(pos[cj[m]] - pos[ci[m]], axis=1))
    r_frames = []
    for f in ds.frames:
        p, (i, j) = f[keys.POSITIONS], f[keys.EDGE_INDEX]
        r_frames.append(np.linalg.norm(p[j] - p[i], axis=1))
    np.testing.assert_allclose(r_batched, np.sort(np.concatenate(r_frames)), atol=1e-12)
