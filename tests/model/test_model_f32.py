"""Float32 model battery — the reference parameterizes its whole model test
battery over model_dtype float32/float64 with 5e-5 / 1e-10 tolerances
(``/root/reference/tests/model/test_allegro.py:72-74``). The f64 battery lives
in ``test_allegro_model.py`` (slow tier); this file guards the f32 numerics
policy end-to-end: with the model's default ``allow_tf32=False`` (full-f32
matmuls, explicit ``precision=`` on every hot dot/einsum), f32 forces must
track the f64 oracle to 5e-5 WITHOUT any global precision flag.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.lib.wigner import rand_rotation
from allegro_tpu.model import AllegroModel

R_MAX = 2.5
F32_TOL = 5e-5  # reference f32 consistency tolerance


@pytest.fixture(autouse=True)
def _unpin_precision():
    """The conftest pins highest matmul precision globally; the point of this
    battery is that the MODEL pins its own — drop the global pin here."""
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "float32")
    yield
    jax.config.update("jax_default_matmul_precision", old or "highest")


def _frame(rng, n_atoms=10):
    return {
        keys.POSITIONS: rng.randn(n_atoms, 3) * 1.6,
        keys.ATOM_TYPES: rng.randint(0, 3, n_atoms).astype(np.int32),
    }


def _prep(frame, dtype=np.float32, **kw):
    fr = neighbor_list(frame, R_MAX)
    b = batch_frames([fr], n_frames=1, edge_multiple=1, **kw)
    return to_jax(b, dtype=dtype)


def _model(dtype_str, **over):
    kw = dict(
        r_max=R_MAX,
        type_names=["A", "B", "C"],
        l_max=2,
        parity=True,
        num_layers=2,
        num_scalar_features=16,
        num_tensor_features=4,
        scalar_embed_mlp_hidden_layers_width=16,
        allegro_mlp_hidden_layers_width=16,
        readout_mlp_hidden_layers_width=16,
        avg_num_neighbors=6.0,
        per_type_energy_scales=1.3,
        per_type_energy_shifts=[0.1, -0.2, 0.3],
        model_dtype=dtype_str,
    )
    kw.update(over)
    return AllegroModel(**kw)


def test_f32_tracks_f64_oracle(rng):
    """Same params: f32 energies/forces within 5e-5 of the f64 model."""
    m32, m64 = _model("float32"), _model("float64")
    fr = _frame(np.random.RandomState(11))
    d32, d64 = _prep(fr, np.float32), _prep(fr, np.float64)
    p64 = m64.init(0, d64)
    p32 = jax.tree.map(lambda x: x.astype(np.float32), p64)
    out64 = m64(p64, d64)
    out32 = m32(p32, d32)
    f64 = np.asarray(out64[keys.FORCES], np.float64)
    f32 = np.asarray(out32[keys.FORCES], np.float64)
    scale = max(float(np.abs(f64).max()), 1.0)
    assert np.abs(f32 - f64).max() <= F32_TOL * scale
    assert (
        abs(float(out32[keys.TOTAL_ENERGY].sum()) - float(out64[keys.TOTAL_ENERGY].sum()))
        <= F32_TOL * max(abs(float(out64[keys.TOTAL_ENERGY].sum())), 1.0)
    )


def test_f32_rotation_equivariance(rng):
    model = _model("float32")
    fr = _frame(np.random.RandomState(7))
    data = _prep(fr)
    params = model.init(0, data)
    out = model(params, data)
    R = rand_rotation(rng)
    fr_rot = dict(fr)
    fr_rot[keys.POSITIONS] = fr[keys.POSITIONS] @ R.T
    out_rot = model(params, _prep(fr_rot))
    # reference f32 equivariance tolerance: 1e-3 (test_contract_basic.py:85-90)
    np.testing.assert_allclose(
        np.asarray(out_rot[keys.TOTAL_ENERGY]),
        np.asarray(out[keys.TOTAL_ENERGY]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_rot[keys.FORCES]),
        np.asarray(out[keys.FORCES]) @ R.T,
        atol=1e-3,
    )


def test_f32_energy_force_consistency(rng):
    """Forces = -dE/dx by central finite differences at f32."""
    model = _model("float32")
    fr = _frame(np.random.RandomState(3), n_atoms=8)
    data = _prep(fr)
    params = model.init(0, data)
    out = model(params, data)
    f = np.asarray(out[keys.FORCES])
    h = 1e-3
    rs = np.random.RandomState(0)
    for _ in range(4):
        a = rs.randint(0, 8)
        k = rs.randint(0, 3)
        for sign, store in ((+1, "plus"), (-1, "minus")):
            fr2 = dict(fr)
            pos = fr[keys.POSITIONS].copy()
            pos[a, k] += sign * h
            fr2[keys.POSITIONS] = pos
            e = float(model.apply(params, _prep(fr2))[keys.TOTAL_ENERGY].sum())
            if store == "plus":
                ep = e
            else:
                em = e
        fd = -(ep - em) / (2 * h)
        assert abs(fd - f[a, k]) < 5e-3 * max(abs(fd), 1.0), (a, k, fd, f[a, k])


def test_f32_batch_vs_single_frame(rng):
    model = _model("float32")
    r = np.random.RandomState(5)
    frames = [neighbor_list(_frame(r, n_atoms=n), R_MAX) for n in (8, 11)]
    params = model.init(0, to_jax(batch_frames([frames[0]], n_frames=1), np.float32))
    singles = [
        model(params, to_jax(batch_frames([f], n_frames=1), np.float32)) for f in frames
    ]
    both = model(
        params, to_jax(batch_frames(frames, n_frames=2, edge_multiple=8), np.float32)
    )
    e_b = np.asarray(both[keys.TOTAL_ENERGY]).reshape(-1)[:2]
    for i, s in enumerate(singles):
        np.testing.assert_allclose(
            e_b[i], float(np.asarray(s[keys.TOTAL_ENERGY]).sum()), atol=5e-5, rtol=5e-5
        )
    f_b = np.asarray(both[keys.FORCES])
    np.testing.assert_allclose(f_b[:8], np.asarray(singles[0][keys.FORCES])[:8], atol=5e-5)
    np.testing.assert_allclose(
        f_b[8:19], np.asarray(singles[1][keys.FORCES])[:11], atol=5e-5
    )
