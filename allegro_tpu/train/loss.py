"""Energy/force losses and metrics.

Role of nequip's ``EnergyForceLoss`` / ``EnergyForceMetrics``
(``configs/tutorial.yaml:49-60``): weighted MSE on (optionally per-atom)
total energy and forces, and MAE/RMSE metrics. All reductions respect the
padding masks so padded atoms/frames/edges never contribute.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..data import keys


def _masks(data: Dict):
    fm = data.get(keys.FRAME_MASK)
    nm = data.get(keys.NODE_MASK)
    e = data[keys.TOTAL_ENERGY]
    frame_mask = fm.astype(e.dtype) if fm is not None else jnp.ones(e.shape[0], e.dtype)
    n_atoms_per_frame = data[keys.NUM_NODES].astype(e.dtype)
    node_mask = (
        nm.astype(e.dtype)
        if nm is not None
        else jnp.ones(data[keys.POSITIONS].shape[0], e.dtype)
    )
    return frame_mask, node_mask, n_atoms_per_frame


class EnergyForceLoss:
    """``coeffs`` maps {"total_energy", "per_atom_energy", "forces"} → weight."""

    def __init__(self, coeffs: Dict[str, float] | None = None):
        self.coeffs = dict(coeffs or {"per_atom_energy": 1.0, "forces": 1.0})

    def __call__(self, pred: Dict, ref: Dict) -> Tuple[jnp.ndarray, Dict]:
        frame_mask, node_mask, n_per_frame = _masks(ref)
        n_frames = jnp.maximum(frame_mask.sum(), 1.0)
        n_nodes = jnp.maximum(node_mask.sum(), 1.0)
        de = (pred[keys.TOTAL_ENERGY] - ref[keys.TOTAL_ENERGY])[:, 0] * frame_mask
        terms = {}
        if "total_energy" in self.coeffs:
            terms["total_energy"] = jnp.sum(de**2) / n_frames
        if "per_atom_energy" in self.coeffs:
            terms["per_atom_energy"] = (
                jnp.sum((de / jnp.maximum(n_per_frame, 1.0)) ** 2) / n_frames
            )
        if "forces" in self.coeffs:
            df = (pred[keys.FORCES] - ref[keys.FORCES]) * node_mask[:, None]
            terms["forces"] = jnp.sum(df**2) / (3.0 * n_nodes)
        loss = sum(self.coeffs[k] * v for k, v in terms.items())
        return loss, terms


class EnergyForceMetrics:
    """MAE/RMSE metrics dict (masked means)."""

    def __call__(self, pred: Dict, ref: Dict) -> Dict[str, jnp.ndarray]:
        frame_mask, node_mask, n_per_frame = _masks(ref)
        n_frames = jnp.maximum(frame_mask.sum(), 1.0)
        n_nodes = jnp.maximum(node_mask.sum(), 1.0)
        de = (pred[keys.TOTAL_ENERGY] - ref[keys.TOTAL_ENERGY])[:, 0] * frame_mask
        de_pa = de / jnp.maximum(n_per_frame, 1.0)
        df = (pred[keys.FORCES] - ref[keys.FORCES]) * node_mask[:, None]
        return {
            "total_energy_mae": jnp.sum(jnp.abs(de)) / n_frames,
            "per_atom_energy_mae": jnp.sum(jnp.abs(de_pa)) / n_frames,
            "total_energy_rmse": jnp.sqrt(jnp.sum(de**2) / n_frames),
            "forces_mae": jnp.sum(jnp.abs(df)) / (3.0 * n_nodes),
            "forces_rmse": jnp.sqrt(jnp.sum(df**2) / (3.0 * n_nodes)),
        }
