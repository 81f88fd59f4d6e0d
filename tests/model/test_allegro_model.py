"""Model-level tests: the battery the reference inherits from nequip's
``BaseEnergyModelTests`` (SURVEY.md §4) — equivariance of energies/forces,
permutation invariance, energy–force consistency by finite differences,
batch-vs-single-frame consistency, strict locality, and padding invariance —
over the reference's config grid (Bessel/Spline embeds × parity ×
path-channel coupling, ``tests/model/test_allegro.py:27-117``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from allegro_tpu.data import batch_frames, keys, to_jax
from allegro_tpu.data.datasets import synthetic_molecular_frames
from allegro_tpu.data.neighborlist import neighbor_list
from allegro_tpu.lib.wigner import rand_rotation
from allegro_tpu.model import AllegroModel

R_MAX = 2.5
N_TYPES = 3


def _frame(rng, n_atoms=10, spread=1.6):
    pos = rng.randn(n_atoms, 3) * spread
    types = rng.randint(0, N_TYPES, n_atoms).astype(np.int32)
    return {keys.POSITIONS: pos, keys.ATOM_TYPES: types}


def _prep(frame, n_atoms=None, n_edges=None):
    fr = neighbor_list(frame, R_MAX)
    b = batch_frames([fr], n_atoms=n_atoms or fr[keys.POSITIONS].shape[0],
                     n_edges=n_edges, n_frames=1, edge_multiple=1)
    return to_jax(b, dtype=np.float64)


MODEL_GRID = [
    dict(),  # defaults: bessel, parity, coupling
    dict(parity=False),
    dict(tp_path_channel_coupling=False),
    dict(radial_chemical_embed={"_target_": "allegro_tpu.nn.TwoBodySplineScalarEmbed"}),
    dict(per_edge_type_cutoff={"A": 2.0, "B": {"A": 1.5, "B": 2.2, "C": 2.4}}),
]


def _model(**over):
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
        model_dtype="float64",
    )
    kw.update(over)
    return AllegroModel(**kw)


@pytest.fixture(params=range(len(MODEL_GRID)), ids=lambda i: f"cfg{i}")
def model_and_params(request, rng):
    model = _model(**MODEL_GRID[request.param])
    data = _prep(_frame(np.random.RandomState(42)))
    params = model.init(0, data)
    return model, params


def test_rotation_equivariance(model_and_params, rng):
    model, params = model_and_params
    fr = _frame(np.random.RandomState(7))
    out = model(params, _prep(fr))
    R = rand_rotation(rng)
    fr_rot = dict(fr)
    fr_rot[keys.POSITIONS] = fr[keys.POSITIONS] @ R.T
    out_rot = model(params, _prep(fr_rot))
    np.testing.assert_allclose(
        out_rot[keys.TOTAL_ENERGY], out[keys.TOTAL_ENERGY], atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out_rot[keys.FORCES]), np.asarray(out[keys.FORCES]) @ R.T, atol=1e-9
    )


def test_translation_and_parity_invariance(model_and_params, rng):
    model, params = model_and_params
    fr = _frame(np.random.RandomState(8))
    out = model(params, _prep(fr))
    fr_t = dict(fr)
    fr_t[keys.POSITIONS] = fr[keys.POSITIONS] + np.array([1.0, -2.0, 0.5])
    out_t = model(params, _prep(fr_t))
    np.testing.assert_allclose(out_t[keys.TOTAL_ENERGY], out[keys.TOTAL_ENERGY], atol=1e-10)
    np.testing.assert_allclose(out_t[keys.FORCES], out[keys.FORCES], atol=1e-9)
    fr_p = dict(fr)
    fr_p[keys.POSITIONS] = -fr[keys.POSITIONS]
    out_p = model(params, _prep(fr_p))
    np.testing.assert_allclose(out_p[keys.TOTAL_ENERGY], out[keys.TOTAL_ENERGY], atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out_p[keys.FORCES]), -np.asarray(out[keys.FORCES]), atol=1e-9
    )


def test_permutation_invariance(model_and_params):
    model, params = model_and_params
    fr = _frame(np.random.RandomState(9))
    out = model(params, _prep(fr))
    perm = np.random.RandomState(1).permutation(fr[keys.POSITIONS].shape[0])
    fr_p = {
        keys.POSITIONS: fr[keys.POSITIONS][perm],
        keys.ATOM_TYPES: fr[keys.ATOM_TYPES][perm],
    }
    out_p = model(params, _prep(fr_p))
    np.testing.assert_allclose(out_p[keys.TOTAL_ENERGY], out[keys.TOTAL_ENERGY], atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out_p[keys.FORCES]),
        np.asarray(out[keys.FORCES])[perm],
        atol=1e-9,
    )


def test_energy_force_consistency(model_and_params):
    """Forces equal minus the numerical gradient of the energy."""
    model, params = model_and_params
    fr = _frame(np.random.RandomState(10), n_atoms=6)
    data = _prep(fr)
    out = model(params, data)
    forces = np.asarray(out[keys.FORCES])
    eps = 1e-5
    for atom, axis in [(0, 0), (2, 1), (5, 2)]:
        fp = dict(fr); fm = dict(fr)
        dp = fr[keys.POSITIONS].copy(); dp[atom, axis] += eps
        dm = fr[keys.POSITIONS].copy(); dm[atom, axis] -= eps
        fp[keys.POSITIONS] = dp
        fm[keys.POSITIONS] = dm
        ep = float(model(params, _prep(fp))[keys.TOTAL_ENERGY].sum())
        em = float(model(params, _prep(fm))[keys.TOTAL_ENERGY].sum())
        f_num = -(ep - em) / (2 * eps)
        np.testing.assert_allclose(forces[atom, axis], f_num, atol=1e-6, rtol=1e-5)


def test_batch_vs_single_frame(model_and_params):
    model, params = model_and_params
    r1, r2 = np.random.RandomState(11), np.random.RandomState(12)
    f1, f2 = _frame(r1), _frame(r2, n_atoms=8)
    o1 = model(params, _prep(f1))
    o2 = model(params, _prep(f2))
    b = to_jax(
        batch_frames(
            [neighbor_list(f1, R_MAX), neighbor_list(f2, R_MAX)],
            n_atoms=24, n_edges=512, n_frames=2,
        ),
        dtype=np.float64,
    )
    ob = model(params, b)
    np.testing.assert_allclose(
        np.asarray(ob[keys.TOTAL_ENERGY]).ravel(),
        [float(o1[keys.TOTAL_ENERGY].sum()), float(o2[keys.TOTAL_ENERGY].sum())],
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(ob[keys.FORCES])[:10], np.asarray(o1[keys.FORCES]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ob[keys.FORCES])[10:18], np.asarray(o2[keys.FORCES]), atol=1e-9
    )


def test_padding_invariance(model_and_params):
    model, params = model_and_params
    fr = _frame(np.random.RandomState(13))
    n = fr[keys.POSITIONS].shape[0]
    o_tight = model(params, _prep(fr))
    o_padded = model(params, _prep(fr, n_atoms=n + 7, n_edges=400))
    np.testing.assert_allclose(
        o_padded[keys.TOTAL_ENERGY][:1], o_tight[keys.TOTAL_ENERGY][:1], atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(o_padded[keys.FORCES])[:n], np.asarray(o_tight[keys.FORCES]), atol=1e-10
    )
    assert np.all(np.asarray(o_padded[keys.FORCES])[n:] == 0.0)


def test_strict_locality(model_and_params):
    """Adding an atom farther than r_max changes nothing (strict locality —
    the property pair_allegro's domain decomposition exploits,
    reference ``tests/model/test_allegro.py:69-71``)."""
    model, params = model_and_params
    fr = _frame(np.random.RandomState(14))
    n = fr[keys.POSITIONS].shape[0]
    out = model(params, _prep(fr, n_atoms=n + 1, n_edges=300))
    far = dict(fr)
    far[keys.POSITIONS] = np.concatenate([fr[keys.POSITIONS], [[100.0, 100.0, 100.0]]])
    far[keys.ATOM_TYPES] = np.concatenate([fr[keys.ATOM_TYPES], [1]]).astype(np.int32)
    out_far = model(params, _prep(far, n_atoms=n + 1, n_edges=300))
    # the far atom contributes exactly its isolated-atom (shift) energy;
    # everything about the original atoms is untouched
    np.testing.assert_allclose(
        np.asarray(out_far[keys.PER_ATOM_ENERGY])[:n],
        np.asarray(out[keys.PER_ATOM_ENERGY])[:n],
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(out_far[keys.FORCES])[:n], np.asarray(out[keys.FORCES])[:n], atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(out_far[keys.FORCES])[n], 0.0, atol=1e-10)


def test_per_atom_energy_sums_to_total(model_and_params):
    model, params = model_and_params
    data = _prep(_frame(np.random.RandomState(15)))
    out = model(params, data)
    np.testing.assert_allclose(
        float(out[keys.PER_ATOM_ENERGY].sum()),
        float(out[keys.TOTAL_ENERGY].sum()),
        atol=1e-10,
    )
