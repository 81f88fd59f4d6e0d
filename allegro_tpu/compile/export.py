"""AOT inference artifacts via ``jax.export``.

The analogue of ``nequip-compile``'s TorchScript/AOTInductor outputs
(SURVEY.md §3.3): the jitted force call is lowered to StableHLO at fixed
padded shapes and serialized together with the parameters into a single
``.atpu`` zip — loadable for inference (from Python or, via the PJRT C API,
from a C++ MD driver) without any model-building code.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..data import keys


def _to_plain(obj):
    """Mappings → plain nested dicts (a stable, serializable pytree type)."""
    if hasattr(obj, "items"):
        return {k: _to_plain(v) for k, v in obj.items()}
    return obj


def _skeletonize(obj, leaves: list):
    """Replace leaves with indices; record them in traversal order (sorted
    keys — matching jax's dict flatten order, but independent of it)."""
    if isinstance(obj, dict):
        return {k: _skeletonize(obj[k], leaves) for k in sorted(obj)}
    leaves.append(obj)
    return {"__leaf__": len(leaves) - 1}


def _unskeletonize(skel, leaves):
    if isinstance(skel, dict) and "__leaf__" in skel:
        return leaves[skel["__leaf__"]]
    return {k: _unskeletonize(v, leaves) for k, v in skel.items()}


def export_model(
    model,
    params,
    target: str = "pair_allegro",
    n_atoms: int = 512,
    n_edges: int = 8192,
    dtype=np.float32,
    extra_shapes: Optional[Dict[str, Tuple]] = None,
) -> bytes:
    """Serialize the model's force call for one padded shape signature."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from .targets import COMPILE_TARGETS

    tgt = COMPILE_TARGETS[target]

    def fn(params, positions, edge_index, atom_types, node_mask, edge_mask):
        data = {
            keys.POSITIONS: positions,
            keys.EDGE_INDEX: edge_index,
            keys.ATOM_TYPES: atom_types,
            keys.NODE_MASK: node_mask,
            keys.EDGE_MASK: edge_mask,
        }
        out = model.apply_with_derivatives(params, data)
        if keys.VIRIAL in tgt.outputs and keys.VIRIAL not in out:
            # ghost-format (open-boundary) virial: E is translation-invariant,
            # so dE/dε under x' = x(I+ε) is the fdotr sum Σᵢ rᵢ ⊗ (∂E/∂rᵢ),
            # i.e. VIRIAL = -dE/dε = Σᵢ rᵢ ⊗ fᵢ over real + ghost rows — the
            # same quantity LAMMPS' virial_fdotr_compute accumulates from
            # pair_allegro's forces (reference docs/guide/lammps.md)
            f = out[keys.FORCES]
            out[keys.VIRIAL] = jnp.einsum(
                "na,nb->ab", positions.astype(f.dtype), f, precision="highest"
            )[None]
        return tuple(out[k] for k in tgt.outputs)

    # plain-dict params: a stable pytree type that the artifact can rebuild
    # without poking jax.export internals (the treedef is serialized as a
    # JSON skeleton in meta.json)
    params = _to_plain(params)
    args = (
        params,
        jnp.zeros((n_atoms, 3), dtype),
        jnp.zeros((2, n_edges), jnp.int32),
        jnp.zeros((n_atoms,), jnp.int32),
        jnp.zeros((n_atoms,), bool),
        jnp.zeros((n_edges,), bool),
    )
    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    # raw StableHLO MLIR too: consumable by a C++ PJRT client
    # (PJRT_Client_Compile takes MLIR; the jax.export blob is jax-specific)
    try:
        mlir_blob = exported.mlir_module_serialized
    except AttributeError:
        mlir_blob = str(exported.mlir_module()).encode()

    # C-contiguous copies: the native driver's minimal npy parser (and the
    # PJRT buffer-from-host call) expect row-major data
    params_np = jax.tree.map(lambda x: np.ascontiguousarray(np.asarray(x)), params)
    flat: list = []
    skeleton = _skeletonize(params_np, flat)
    buf = io.BytesIO()
    np.savez(buf, **{f"p{i}": a for i, a in enumerate(flat)})
    meta = {
        "format": "allegro-tpu-atpu-v1",
        "target": target,
        "inputs": list(tgt.inputs),
        "outputs": list(tgt.outputs),
        "n_atoms": n_atoms,
        "n_edges": n_edges,
        "dtype": np.dtype(dtype).name,
        "n_params": len(flat),
        "params_tree": skeleton,
        "config": {k: str(v) for k, v in getattr(model, "config", {}).items()},
    }
    # serialized xla CompileOptionsProto: PJRT_Client_Compile (C API) needs
    # it verbatim — generating it here spares the C++ MD driver a protobuf
    # dependency
    try:
        from jax._src.lib import xla_client as _xc

        compile_opts = _xc.CompileOptions().SerializeAsString()
    except Exception:
        compile_opts = b""

    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as z:
        z.writestr("model.stablehlo", blob)
        z.writestr("model.mlir", mlir_blob)
        z.writestr("params.npz", buf.getvalue())
        z.writestr("compile_options.pb", compile_opts)
        z.writestr("meta.json", json.dumps(meta, indent=2))
    return out.getvalue()


class LoadedModel:
    """An AOT artifact rehydrated for inference."""

    def __init__(self, exported, params_flat, meta):
        self._exported = exported
        self._params = params_flat
        self.meta = meta

    def __call__(self, positions, edge_index, atom_types, node_mask=None, edge_mask=None):
        import jax.numpy as jnp

        n_atoms, n_edges = self.meta["n_atoms"], self.meta["n_edges"]
        assert positions.shape == (n_atoms, 3), (positions.shape, n_atoms)
        assert edge_index.shape == (2, n_edges)
        if node_mask is None:
            node_mask = np.ones(n_atoms, bool)
        if edge_mask is None:
            edge_mask = np.ones(n_edges, bool)
        dt = self.meta["dtype"]
        args = (
            self._params,
            jnp.asarray(positions, dt),
            jnp.asarray(edge_index, jnp.int32),
            jnp.asarray(atom_types, jnp.int32),
            jnp.asarray(node_mask, bool),
            jnp.asarray(edge_mask, bool),
        )
        out = self._exported.call(*args)
        return dict(zip(self.meta["outputs"], out))


def load_exported(path_or_bytes) -> LoadedModel:
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = io.BytesIO(path_or_bytes)
    else:
        blob = open(path_or_bytes, "rb")
    with zipfile.ZipFile(blob) as z:
        exported = jexport.deserialize(z.read("model.stablehlo"))
        meta = json.loads(z.read("meta.json"))
        npz = np.load(io.BytesIO(z.read("params.npz")))
        flat = [npz[f"p{i}"] for i in range(meta["n_params"])]
    # rebuild the params pytree from the serialized JSON skeleton — no
    # private jax.export structure access (version-drift-proof)
    params = _unskeletonize(meta["params_tree"], flat)
    return LoadedModel(exported, params, meta)


def compile_model(config: Dict, workdir: str, ckpt: Optional[str], output: str) -> str:
    """CLI stage: load checkpoint, export, write the artifact."""
    from ..train import Trainer, load_checkpoint
    from ..train.config import build_model
    from ..train.package import resolved_config_for

    cfg = resolved_config_for(config, ckpt or workdir)
    model = build_model(cfg["model"])
    ccfg = dict(cfg.get("compile", {}))
    n_atoms = int(ccfg.get("n_atoms", 512))
    n_edges = int(ccfg.get("n_edges", 8192))
    example = {
        keys.POSITIONS: np.zeros((8, 3)),
        keys.ATOM_TYPES: np.zeros(8, np.int32),
        keys.EDGE_INDEX: np.zeros((2, 4), np.int32),
        keys.EDGE_CELL_SHIFT: np.zeros((4, 3)),
        keys.EDGE_MASK: np.zeros(4, bool),
        keys.NODE_MASK: np.ones(8, bool),
    }
    params = model.init(0, example)
    if ckpt:
        trainer = Trainer(model)
        state = trainer.init_state(0, example)
        try:
            state = load_checkpoint(ckpt, "best", template=state)
        except Exception:
            state = load_checkpoint(ckpt, "last", template=state)
        params = state.ema_params
    blob = export_model(
        model, params, target=ccfg.get("target", "pair_allegro"),
        n_atoms=n_atoms, n_edges=n_edges,
    )
    path = output if os.path.isabs(output) else os.path.join(workdir, output)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    print(f"wrote AOT artifact: {path} ({len(blob)} bytes)")
    return path
