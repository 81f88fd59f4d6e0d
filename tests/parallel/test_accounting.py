"""Exactness checks of the decomposition communication accounting.

The accounting numbers (halo bytes, ghost fraction, collective counts) feed
the documented v5p-8 scaling projection (docs/guide/parallel.md §4), so pin
their definitions against the decompositions' actual static arrays.
"""

import numpy as np
import jax
import pytest

from allegro_tpu.parallel import BrickDecomposition, SlabDecomposition
from allegro_tpu.parallel.accounting import decomposition_accounting, project_step


@pytest.fixture(scope="module")
def crystal():
    rng = np.random.RandomState(0)
    side = 10  # 8 slabs at r_max 1.6 need slab width >= 1.6 -> side*1.4/8
    grid = np.stack(
        np.meshgrid(*(np.arange(side),) * 3, indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float64)
    pos = grid * 1.4 + 0.05 * rng.randn(len(grid), 3)
    types = rng.randint(0, 2, len(grid)).astype(np.int32)
    cell = np.diag([side * 1.4] * 3)
    return pos, types, cell


def test_slab_accounting(crystal):
    pos, types, cell = crystal
    devs = np.array(jax.devices("cpu")[:4])
    mesh = jax.sharding.Mesh(devs, ("dd",))
    dd = SlabDecomposition(pos, types, cell, (True,) * 3, 1.6, mesh)
    acct = decomposition_accounting(dd)
    assert acct["kind"] == "slab" and acct["n_devices"] == 4
    assert acct["n_atoms_total"] == len(pos)
    # owned atoms partition the system exactly
    assert acct["owned_per_device_mean"] * 4 == pytest.approx(len(pos))
    # halo bytes = per stage, 2 sends of [S, 3] f32, fwd + force return
    assert acct["halo_bytes_per_device_step"] == 2 * (2 * dd.S * 3 * 4)
    assert acct["ppermutes_per_step"] == 4  # 2 fwd + 2 force return
    assert 0.0 < acct["ghost_fraction"] < 1.0
    # real ghosts never exceed the padded slots
    assert acct["ghosts_per_device_max"] <= 2 * dd.S


def test_brick_accounting_and_projection(crystal):
    pos, types, cell = crystal
    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 2, 2)
    mesh = jax.sharding.Mesh(devs, ("bx", "by", "bz"))
    dd = BrickDecomposition(pos, types, cell, (True,) * 3, 1.6, mesh)
    acct = decomposition_accounting(dd)
    assert acct["kind"] == "brick" and acct["mesh_shape"] == [2, 2, 2]
    assert len(acct["send_pad_per_stage"]) == 3
    assert acct["ppermutes_per_step"] == 12  # 3 stages x 2 dirs x (fwd+bwd)
    want = 2 * sum(2 * s * 3 * 4 for s in acct["send_pad_per_stage"])
    assert acct["halo_bytes_per_device_step"] == want
    # (brick-beats-slab on ghost volume is a LARGE-scale property — at the
    # 100k bench scale brick carries 31% ghosts vs slab's 39%, see
    # docs/guide/parallel.md §4; at this test's 1k atoms the thin slabs win,
    # so no cross-strategy assertion here)
    proj = project_step(acct, hbm_bytes_per_edge=42000.0, chip="v5p",
                        roofline_frac=0.7)
    assert proj["comm_fraction"] < 0.05  # comm must be a small fraction
    assert proj["step_ms"] > 0 and proj["us_per_atom_projected"] > 0
    # consistency: step = compute + comm
    assert proj["step_ms"] == pytest.approx(
        proj["compute_ms"] + proj["comm_ms"], abs=2e-3
    )
