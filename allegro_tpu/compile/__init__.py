"""Deployment: compile targets, ghost-atom conversion, AOT artifacts.

Covers the reference's integration/deploy layer (SURVEY.md C2,
``allegro/_compile.py``) the TPU way:

- a compile-target registry (``pair_allegro``-equivalent target with fixed
  input/output keys),
- ghost-atom data conversion for MD-engine conventions (PBC edges →
  appended shifted atom copies, cell dropped — ``allegro/_compile.py:28-63``),
- AOT-compiled inference artifacts via ``jax.export`` (StableHLO), the
  analogue of nequip-compile's TorchScript/AOTInductor outputs, loadable
  without the model-building code.
"""

from .targets import (
    CompileTarget,
    COMPILE_TARGETS,
    register_compile_target,
    ghost_atom_conversion,
    collapse_ghost_forces,
)
from .export import compile_model, export_model, load_exported

__all__ = [
    "CompileTarget",
    "COMPILE_TARGETS",
    "register_compile_target",
    "ghost_atom_conversion",
    "collapse_ghost_forces",
    "compile_model",
    "export_model",
    "load_exported",
]
