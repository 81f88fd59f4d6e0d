"""End-to-end training ON the Pallas kernel backend (interpret mode):
the primitive-based TP supports the full force-loss gradient path."""

import numpy as np
import jax
import optax
import pytest

pytestmark = pytest.mark.slow

import allegro_tpu.ops.pallas_contract as pc
from allegro_tpu.data import DataLoader, InMemoryDataset, compute_statistics
from allegro_tpu.data.datasets import synthetic_molecular_frames
from allegro_tpu.model import AllegroModel
from allegro_tpu.train import Trainer


def test_training_on_pallas_kernels():
    pc.INTERPRET = True
    try:
        ds = InMemoryDataset(synthetic_molecular_frames(4, n_atoms=8, spread=1.2), r_max=2.0)
        st = compute_statistics(ds)
        model = AllegroModel(
            r_max=2.0,
            type_names=["A", "B", "C"],
            l_max=1,
            num_layers=1,
            num_scalar_features=8,
            num_tensor_features=4,
            scalar_embed_mlp_hidden_layers_width=8,
            allegro_mlp_hidden_layers_width=8,
            readout_mlp_hidden_layers_width=8,
            avg_num_neighbors=max(st["num_neighbors_mean"], 1.0),
            per_type_energy_scales=1.0,
            per_type_energy_shifts=0.0,
            tp_kernel_backend="pallas",
        )
        dl = DataLoader(ds, batch_size=2)
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("dp",))
        trainer = Trainer(model, optimizer=optax.adam(5e-3), mesh=mesh, logger=lambda s: None)
        state = trainer.init_state(0, next(iter(dl)))
        init_params = jax.tree.map(np.asarray, state.params)
        state = trainer.fit(state, dl, max_epochs=3)
        losses = [h["train_loss"] for h in trainer.history]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # kernels train
        # the TP path weights moved → weight grads flowed through the kernels
        flat0 = jax.tree_util.tree_leaves_with_path(init_params)
        flat1 = dict(
            ("/".join(str(p) for p in path), leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(state.params)
        )
        moved = False
        for path, leaf0 in flat0:
            key = "/".join(str(p) for p in path)
            if "path_weights" in key:
                if not np.allclose(np.asarray(flat1[key]), leaf0):
                    moved = True
        assert moved, "TP path weights did not receive gradients"
    finally:
        pc.INTERPRET = False
