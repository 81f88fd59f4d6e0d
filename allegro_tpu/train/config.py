"""YAML config system with ``_target_`` instantiation and dataset-statistics
interpolation.

Role of the reference's Hydra/OmegaConf stack (SURVEY.md §5 config system):
``_target_:`` blocks select registered builders, and strings of the form
``${training_data_stats:KEY}`` are resolved from the computed dataset
statistics exactly like the reference's custom resolver
(``configs/tutorial.yaml:143-153``).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import yaml

_STATS_RE = re.compile(r"^\$\{training_data_stats:([a-zA-Z_0-9]+)\}$")
_REF_RE = re.compile(r"^\$\{([a-zA-Z_0-9.]+)\}$")


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def _lookup(root: Dict, dotted: str):
    cur: Any = root
    for part in dotted.split("."):
        cur = cur[part]
    return cur


def resolve(cfg, stats: Dict[str, Any] | None = None, root=None):
    """Recursively resolve ``${training_data_stats:...}`` and ``${a.b}``."""
    if root is None:
        root = cfg
    if isinstance(cfg, dict):
        return {k: resolve(v, stats, root) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [resolve(v, stats, root) for v in cfg]
    if isinstance(cfg, str):
        m = _STATS_RE.match(cfg)
        if m:
            if stats is None:
                raise ValueError(f"no dataset statistics available to resolve {cfg}")
            return stats[m.group(1)]
        m = _REF_RE.match(cfg)
        if m:
            return resolve(_lookup(root, m.group(1)), stats, root)
    return cfg


def build_model(model_cfg: Dict[str, Any]):
    """Instantiate a model from a ``_target_`` config block."""
    from ..model.builders import MODEL_BUILDERS

    cfg = dict(model_cfg)
    target = cfg.pop("_target_", "allegro_tpu.model.AllegroModel")
    cfg.pop("seed", None)  # seed is consumed at Model.init time
    cfg.pop("compile_mode", None)  # jit is always on in this framework
    short = target.rsplit(".", 1)[-1]
    if short not in MODEL_BUILDERS and target not in MODEL_BUILDERS:
        raise ValueError(f"unknown model builder {target}")
    builder = MODEL_BUILDERS.get(target, MODEL_BUILDERS.get(short))
    return builder(**cfg)
