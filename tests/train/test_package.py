import numpy as np
import jax

from allegro_tpu.data import keys
from allegro_tpu.train.package import load_package, save_package
from allegro_tpu.train.config import build_model


MODEL_CFG = {
    "_target_": "allegro_tpu.model.AllegroModel",
    "r_max": 2.0,
    "type_names": ["A", "B"],
    "l_max": 1,
    "num_layers": 1,
    "num_scalar_features": 8,
    "num_tensor_features": 4,
    "scalar_embed_mlp_hidden_layers_width": 8,
    "allegro_mlp_hidden_layers_width": 8,
    "readout_mlp_hidden_layers_width": 8,
    "avg_num_neighbors": 4.0,
    "per_type_energy_scales": 1.0,
    "per_type_energy_shifts": 0.0,
    "model_dtype": "float64",
}


def _dummy():
    return {
        keys.POSITIONS: np.random.RandomState(0).randn(6, 3),
        keys.ATOM_TYPES: np.zeros(6, np.int32),
        keys.EDGE_INDEX: np.array([[0, 1, 2], [1, 0, 3]], np.int32),
        keys.EDGE_CELL_SHIFT: np.zeros((3, 3)),
        keys.EDGE_MASK: np.ones(3, bool),
    }


def test_package_roundtrip(tmp_path):
    model = build_model(MODEL_CFG)
    data = _dummy()
    params = model.init(7, data)
    path = str(tmp_path / "m.atpkg")
    save_package(path, MODEL_CFG, params)
    model2, params2, meta = load_package(path)
    out1 = model(params, data)
    out2 = model2(params2, data)
    np.testing.assert_allclose(
        np.asarray(out1[keys.TOTAL_ENERGY]), np.asarray(out2[keys.TOTAL_ENERGY]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out1[keys.FORCES]), np.asarray(out2[keys.FORCES]), atol=0
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
