"""Model packaging: one archive with everything needed to rebuild a model.

Role of ``nequip-package`` (reference: ``allegro/_extern.py``, SURVEY.md L7):
bundles the resolved model config, the (EMA) parameters, and metadata into a
single ``.atpkg`` zip, restorable with :func:`load_package` — independent of
checkpoints/work dirs, suitable for distribution and as input to
``allegro_tpu compile``.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .._version import __version__


def save_package(path: str, model_config: Dict[str, Any], params, extra: Optional[Dict] = None) -> str:
    import jax

    flat, treedef = jax.tree.flatten(jax.tree.map(np.asarray, params))
    buf = io.BytesIO()
    np.savez(buf, **{f"p{i}": a for i, a in enumerate(flat)})
    meta = {
        "format": "allegro-tpu-package-v1",
        "version": __version__,
        "n_params": len(flat),
        "extra": extra or {},
    }
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("config.json", json.dumps(model_config, indent=2, default=str))
        z.writestr("params.npz", buf.getvalue())
        z.writestr("meta.json", json.dumps(meta, indent=2))
    return path


def load_package(path: str) -> Tuple[Any, Any, Dict]:
    """Returns (model, params, meta). The model is rebuilt from the packaged
    config; the params pytree structure is recovered from a fresh init."""
    import jax

    from .config import build_model

    with zipfile.ZipFile(path) as z:
        cfg = json.loads(z.read("config.json"))
        meta = json.loads(z.read("meta.json"))
        npz = np.load(io.BytesIO(z.read("params.npz")))
        flat = [npz[f"p{i}"] for i in range(meta["n_params"])]
    model = build_model(cfg)
    # recover the treedef from a template init on a tiny dummy system
    from ..data import keys

    dummy = {
        keys.POSITIONS: np.zeros((4, 3)),
        keys.ATOM_TYPES: np.zeros(4, np.int32),
        keys.EDGE_INDEX: np.zeros((2, 2), np.int32),
        keys.EDGE_CELL_SHIFT: np.zeros((2, 3)),
        keys.EDGE_MASK: np.zeros(2, bool),
    }
    template = model.init(0, dummy)
    treedef = jax.tree.structure(template)
    params = jax.tree.unflatten(treedef, flat)
    # shape check against the template
    for a, b in zip(jax.tree.leaves(template), flat):
        assert np.asarray(a).shape == b.shape, (np.asarray(a).shape, b.shape)
    return model, params, meta


def resolved_config_for(config: Dict, workdir: str) -> Dict:
    """Prefer the statistics-resolved config saved by the train stage."""
    from .config import resolve

    path = os.path.join(workdir, "resolved_config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return resolve(config, stats=None)


def run_package(config: Dict, workdir: str, ckpt: Optional[str], output: str) -> str:
    from . import Trainer, load_checkpoint
    from .config import build_model

    cfg = resolved_config_for(config, ckpt or workdir)
    model_cfg = cfg["model"]
    model = build_model(model_cfg)
    from ..data import keys

    dummy = {
        keys.POSITIONS: np.zeros((4, 3)),
        keys.ATOM_TYPES: np.zeros(4, np.int32),
        keys.EDGE_INDEX: np.zeros((2, 2), np.int32),
        keys.EDGE_CELL_SHIFT: np.zeros((2, 3)),
        keys.EDGE_MASK: np.zeros(2, bool),
    }
    params = model.init(int(model_cfg.get("seed", 0)), dummy)
    src = ckpt or workdir
    try:
        trainer = Trainer(model)
        state = trainer.init_state(0, dummy)
        try:
            state = load_checkpoint(src, "best", template=state)
        except Exception:
            state = load_checkpoint(src, "last", template=state)
        params = state.ema_params
        loaded = True
    except Exception:
        loaded = False
    path = output if os.path.isabs(output) else os.path.join(workdir, output)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_package(path, model_cfg, params, extra={"from_checkpoint": loaded})
    print(f"wrote package: {path}")
    return path
