"""Native C++ cell-list neighbor list vs the scipy reference: identical edge
sets on open, periodic, triclinic, tiny-cell, and unwrapped-position systems."""

import numpy as np
import pytest

from allegro_tpu.native import native_available, native_neighbor_list


def _scipy_impl(pos, r_max, cell, pbc):
    import os

    os.environ["ALLEGRO_TPU_NATIVE"] = "0"
    try:
        from allegro_tpu.data.neighborlist import primitive_neighbor_list

        return primitive_neighbor_list(pos, r_max, cell, pbc)
    finally:
        os.environ["ALLEGRO_TPU_NATIVE"] = "1"


def _edge_set(i, j, s):
    return {(int(a), int(b), tuple(np.rint(ss).astype(int))) for a, b, ss in zip(i, j, s)}


pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def test_open_boundary(rng):
    pos = rng.rand(50, 3) * 6.0
    got = native_neighbor_list(pos, 1.5, None, (False,) * 3)
    assert got is not None
    assert _edge_set(*got) == _edge_set(*_scipy_impl(pos, 1.5, None, (False,) * 3))


def test_periodic_cubic(rng):
    pos = rng.rand(40, 3) * 5.0
    cell = np.eye(3) * 5.0
    got = native_neighbor_list(pos, 1.7, cell, (True,) * 3)
    assert _edge_set(*got) == _edge_set(*_scipy_impl(pos, 1.7, cell, (True,) * 3))


def test_triclinic(rng):
    cell = np.array([[4.0, 0, 0], [1.2, 3.8, 0], [-0.5, 0.8, 3.5]])
    pos = rng.rand(30, 3) @ cell
    got = native_neighbor_list(pos, 1.6, cell, (True,) * 3)
    assert _edge_set(*got) == _edge_set(*_scipy_impl(pos, 1.6, cell, (True,) * 3))


def test_mixed_pbc(rng):
    cell = np.eye(3) * 4.0
    pos = rng.rand(25, 3) * 4.0
    pbc = (True, False, True)
    got = native_neighbor_list(pos, 1.5, cell, pbc)
    assert _edge_set(*got) == _edge_set(*_scipy_impl(pos, 1.5, cell, pbc))


def test_tiny_cell_many_images():
    pos = np.zeros((1, 3))
    cell = np.eye(3) * 1.0
    got = native_neighbor_list(pos, 2.05, cell, (True,) * 3)
    assert len(got[0]) == 6 + 12 + 8 + 6


def test_unwrapped_positions(rng):
    """Shifts must be valid for the caller's (unwrapped) coordinates."""
    cell = np.eye(3) * 4.0
    pos = rng.rand(20, 3) * 4.0 + np.array([9.0, -4.0, 2.5])  # far outside box
    got = native_neighbor_list(pos, 1.5, cell, (True,) * 3)
    i, j, s = got
    r = np.linalg.norm(pos[j] - pos[i] + s @ cell, axis=1)
    assert (r < 1.5).all()
    ref = _scipy_impl(pos - np.array([9.0, -4.0, 2.5]), 1.5, cell, (True,) * 3)
    assert len(i) == len(ref[0])


def test_large_random_consistency(rng):
    pos = rng.rand(2000, 3) * 12.0
    cell = np.eye(3) * 12.0
    got = native_neighbor_list(pos, 2.0, cell, (True,) * 3)
    ref = _scipy_impl(pos, 2.0, cell, (True,) * 3)
    assert _edge_set(*got) == _edge_set(*ref)
