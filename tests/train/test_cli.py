"""End-to-end CLI coverage: the `run` stage list (train -> test) and the
`compile` stage, driven exactly as a user would
(`python -m allegro_tpu run -c cfg.yaml -w workdir`) on a tiny synthetic
config. TPU-native counterpart of the reference's nequip-train/-compile
console scripts (SURVEY.md L7; /root/reference/configs/tutorial.yaml:2)."""

import json
import os

import pytest
import yaml

from allegro_tpu.cli import main

pytestmark = pytest.mark.fast

TINY_CFG = {
    "run": ["train", "test"],
    "data": {
        "_target_": "synthetic",
        "r_max": 2.2,
        "n_frames": 12,
        "n_atoms": 6,
        "spread": 1.5,
        "type_names": ["C", "H", "O"],
        "split": {"train": 8, "val": 2, "test": 2},
        "batch_size": 2,
        "seed": 123,
    },
    "trainer": {
        "max_epochs": 1,
        "log_every": 1,
        "loss_coeffs": {"per_atom_energy": 1.0, "forces": 1.0},
        "optimizer": {"_target_": "optax.adam", "learning_rate": 1.0e-3},
    },
    "model": {
        "_target_": "allegro_tpu.model.AllegroModel",
        "seed": 456,
        "model_dtype": "float32",
        "r_max": "${data.r_max}",
        "type_names": "${data.type_names}",
        "l_max": 1,
        "parity": True,
        "radial_chemical_embed_dim": 8,
        "scalar_embed_mlp_hidden_layers_depth": 1,
        "scalar_embed_mlp_hidden_layers_width": 8,
        "num_layers": 1,
        "num_scalar_features": 8,
        "num_tensor_features": 4,
        "allegro_mlp_hidden_layers_depth": 1,
        "allegro_mlp_hidden_layers_width": 8,
        "readout_mlp_hidden_layers_depth": 1,
        "readout_mlp_hidden_layers_width": 8,
        "avg_num_neighbors": "${training_data_stats:num_neighbors_mean}",
        "per_type_energy_shifts": "${training_data_stats:per_type_energy_shifts}",
        "per_type_energy_scales": "${training_data_stats:forces_rms}",
    },
}


@pytest.fixture(scope="module")
def cli_workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    cfg_path = os.path.join(tmp, "tiny.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(TINY_CFG, f)
    workdir = os.path.join(tmp, "out")
    rc = main(["run", "-c", cfg_path, "-w", workdir])
    assert rc == 0
    return cfg_path, workdir


def test_cli_run_trains_and_checkpoints(cli_workdir, capsys):
    _, workdir = cli_workdir
    # orbax checkpoints (last + best) and the resolved config land in workdir
    names = set(os.listdir(workdir))
    assert "resolved_config.json" in names
    assert any("last" in n for n in names)
    with open(os.path.join(workdir, "resolved_config.json")) as f:
        resolved = json.load(f)
    # the ${training_data_stats:...} interpolations resolved to numbers
    assert isinstance(resolved["model"]["avg_num_neighbors"], float)


def test_cli_test_stage_restores_checkpoint(cli_workdir, capsys):
    cfg_path, workdir = cli_workdir
    rc = main(["test", "-c", cfg_path, "-w", workdir])
    assert rc == 0
    out = capsys.readouterr().out
    line = next(ln for ln in out.splitlines() if ln.startswith("test metrics:"))
    metrics = json.loads(line.split("test metrics:", 1)[1])
    assert all(
        k in metrics
        for k in ("total_energy_mae", "per_atom_energy_mae", "forces_mae", "forces_rmse")
    ), metrics


def test_cli_compile_stage_exports_artifact(cli_workdir, tmp_path):
    cfg_path, workdir = cli_workdir
    out_path = os.path.join(tmp_path, "tiny.atpu")
    rc = main(["compile", "-c", cfg_path, "-w", workdir, "-o", out_path])
    assert rc == 0
    assert os.path.exists(out_path) and os.path.getsize(out_path) > 0
