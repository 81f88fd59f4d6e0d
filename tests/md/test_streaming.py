"""Streamed (center-chunked) evaluation == monolithic evaluation.

The streaming evaluator partitions edges at center boundaries, so strict
locality (every per-center env sum inside one chunk) must make it EXACTLY
decomposable — same contract the spatial decompositions rely on
(reference ghost-atom contract: /root/reference/allegro/_compile.py:28-63).
"""

import numpy as np
import pytest

import jax

from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.md.streaming import StreamedEvaluator, build_chunks
from allegro_tpu.model import AllegroModel


def _crystal(side=6, a=2.0, r_max=2.5, seed=0):
    rng = np.random.RandomState(seed)
    grid = np.stack(
        np.meshgrid(*(np.arange(side),) * 3, indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float64)
    pos = grid * a + 0.05 * rng.randn(len(grid), 3)
    frame = {
        keys.POSITIONS: pos,
        keys.ATOM_TYPES: rng.randint(0, 2, len(pos)).astype(np.int32),
        keys.CELL: np.eye(3) * (side * a),
        keys.PBC: np.ones(3, bool),
    }
    return neighbor_list(frame, r_max), len(pos)


def _model(r_max, avg_n, backend="einsum", **kw):
    return AllegroModel(
        r_max=r_max,
        type_names=["A", "B"],
        l_max=2,
        parity=True,
        num_layers=2,
        num_scalar_features=16,
        num_tensor_features=4,
        avg_num_neighbors=avg_n,
        per_type_energy_scales=0.2,
        per_type_energy_shifts=[0.1, -0.2],
        model_dtype="float32",
        tp_kernel_backend=backend,
        **kw,
    )


@pytest.mark.parametrize("n_chunks", [1, 3, 5])
def test_streamed_matches_monolithic(n_chunks):
    r_max = 2.5
    frame, n_atoms = _crystal(r_max=r_max)
    batch = to_jax(batch_frames([frame], n_frames=1), dtype=np.float32)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    model = _model(r_max, n_edges / n_atoms)
    batch = model.precompute_statics(batch)
    params = model.init(0, batch)

    out = jax.jit(lambda p, b: model.apply_with_derivatives(p, b))(
        params, batch
    )
    e_ref = float(np.asarray(out[keys.TOTAL_ENERGY]).sum())
    f_ref = np.asarray(out[keys.FORCES])[:n_atoms]
    v_ref = np.asarray(out[keys.VIRIAL])[0]

    ev = StreamedEvaluator(
        model, params, batch, n_chunks=n_chunks, with_stress=True
    )
    e, f, v = ev(batch[keys.POSITIONS])
    assert abs(float(e) - e_ref) < 1e-4 * max(abs(e_ref), 1.0)
    np.testing.assert_allclose(
        np.asarray(f)[:n_atoms], f_ref, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(v), v_ref, rtol=1e-3, atol=1e-4)


def test_streamed_fused_backend_interpret():
    """Chunked fused block plans (incl. narrow-window) ride each chunk."""
    from allegro_tpu.ops import fused_tp

    r_max = 2.5
    frame, n_atoms = _crystal(side=5, r_max=r_max, seed=2)
    n_edges = frame[keys.EDGE_INDEX].shape[1]
    batch = to_jax(
        batch_frames([frame], n_frames=1, edge_multiple=128),
        dtype=np.float32,
    )
    model = _model(
        r_max, n_edges / n_atoms, backend="fused_infer",
        fused_block_edges=128, window_rows=64,
    )
    oracle = _model(r_max, n_edges / n_atoms)
    b = model.precompute_statics(batch)
    old = fused_tp.INTERPRET
    fused_tp.INTERPRET = True
    try:
        params = model.init(0, b)
        out = jax.jit(lambda p, d: oracle.apply_with_derivatives(p, d))(
            params, batch
        )
        f_ref = np.asarray(out[keys.FORCES])[:n_atoms]
        e_ref = float(np.asarray(out[keys.TOTAL_ENERGY]).sum())
        ev = StreamedEvaluator(model, params, batch, n_chunks=2)
        e, f = ev(batch[keys.POSITIONS])
        e, f = float(e), np.asarray(f)
    finally:
        fused_tp.INTERPRET = old
    assert abs(e - e_ref) < 1e-4 * max(abs(e_ref), 1.0)
    scale = max(float(np.abs(f_ref).max()), 1e-6)
    assert float(np.abs(f[:n_atoms] - f_ref).max()) / scale < 1e-4


def test_build_chunks_partitions_edges():
    frame, n_atoms = _crystal(side=4, seed=3)
    batch = to_jax(batch_frames([frame], n_frames=1), dtype=np.float32)
    model = _model(2.5, 10.0)
    st = build_chunks(batch, model, n_chunks=4)
    # every real edge appears in exactly one chunk
    total = int(np.asarray(st[keys.EDGE_MASK]).sum())
    assert total == frame[keys.EDGE_INDEX].shape[1]
    # owned atom ranges partition 0..n_atoms-1
    own = []
    for k in range(4):
        idx = np.asarray(st["stream_local_idx"][k])
        nm = np.asarray(st[keys.NODE_MASK][k])
        own.append(idx[nm])
    own = np.concatenate(own)
    np.testing.assert_array_equal(np.sort(own), np.arange(n_atoms))
