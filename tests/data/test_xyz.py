import numpy as np

from allegro_tpu.data import keys
from allegro_tpu.data.xyz import extxyz_dataset, read_extxyz, write_extxyz


def _frames(rng, n_frames=3, n=5):
    frames = []
    for _ in range(n_frames):
        frames.append(
            {
                keys.POSITIONS: rng.rand(n, 3) * 4.0,
                keys.ATOMIC_NUMBERS: np.array([1, 6, 8, 1, 6], np.int32),
                keys.FORCES: rng.randn(n, 3),
                keys.TOTAL_ENERGY: np.array([rng.randn()]),
                keys.CELL: np.eye(3) * 4.0,
                keys.PBC: np.array([True, True, False]),
            }
        )
    return frames


def test_extxyz_roundtrip(tmp_path, rng):
    frames = _frames(rng)
    path = str(tmp_path / "t.extxyz")
    write_extxyz(path, frames)
    back = read_extxyz(path)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        np.testing.assert_allclose(b[keys.POSITIONS], a[keys.POSITIONS], atol=1e-9)
        np.testing.assert_array_equal(b[keys.ATOMIC_NUMBERS], a[keys.ATOMIC_NUMBERS])
        np.testing.assert_allclose(b[keys.FORCES], a[keys.FORCES], atol=1e-9)
        np.testing.assert_allclose(b[keys.TOTAL_ENERGY], a[keys.TOTAL_ENERGY], atol=1e-9)
        np.testing.assert_allclose(b[keys.CELL], a[keys.CELL], atol=1e-9)
        np.testing.assert_array_equal(b[keys.PBC], a[keys.PBC])


def test_extxyz_dataset(tmp_path, rng):
    frames = _frames(rng)
    path = str(tmp_path / "t.extxyz")
    write_extxyz(path, frames)
    ds = extxyz_dataset(path, r_max=2.0)
    assert len(ds) == 3
    assert ds.type_names == ["H", "C", "O"]
    fr = ds[0]
    assert keys.EDGE_INDEX in fr and keys.ATOM_TYPES in fr
    assert set(np.unique(fr[keys.ATOM_TYPES]).tolist()) <= {0, 1, 2}
