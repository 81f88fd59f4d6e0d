"""Forces and stresses as autodiff derivatives of the total energy.

Role of nequip's ``ForceStressOutput`` wrapper
(``allegro/model/allegro_models.py:12,103``), rebuilt the JAX way: instead of
a module that toggles ``requires_grad``, this wraps the *apply function* —
``forces = -∂E/∂pos`` via ``jax.grad``, and stress via the symmetric-strain
displacement trick: positions and cell are deformed by ``(I + ε)`` and
``virial = -∂E/∂ε`` at ``ε = 0``; ``stress = -virial / volume``.

The wrapper differentiates the *sum* of all frame energies — per-frame
gradients never mix because atoms belong to exactly one frame.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..data import keys


def force_stress_wrapper(
    apply_fn: Callable[..., Dict], with_stress: bool = True,
    checkpoint_energy: bool = False,
) -> Callable[..., Dict]:
    """Wrap ``apply_fn(params, data) -> data`` to add FORCES (+STRESS/VIRIAL).

    ``checkpoint_energy``: rematerialize the whole energy evaluation in the
    force VJP — only the inputs are saved, the forward is recomputed during
    the backward pass. Combined with per-layer ``remat`` this bounds the
    residual set to one layer's activations: the knob that fits 100k-atom
    force calls on a single 16 GB chip (~1.3x compute)."""
    if checkpoint_energy:
        apply_fn = jax.checkpoint(apply_fn)

    def wrapped(params, data: Dict) -> Dict:
        pos = data[keys.POSITIONS]
        has_cell = keys.CELL in data and keys.EDGE_CELL_SHIFT in data
        do_stress = with_stress and has_cell
        cell = None
        if has_cell:
            cell = data[keys.CELL] if data[keys.CELL].ndim == 3 else data[keys.CELL][None]
        if keys.BATCH in data:
            batch = data[keys.BATCH]
        else:
            batch = jnp.zeros(pos.shape[0], dtype=jnp.int32)

        def _masked_total(out_d):
            e_total = out_d[keys.TOTAL_ENERGY]
            if keys.FRAME_MASK in data:
                e_total = e_total * data[keys.FRAME_MASK].astype(e_total.dtype)[:, None]
            return jnp.sum(e_total)

        if do_stress:

            def energy_of(pos_in, strain):
                d = dict(data)
                # symmetric strain: x' = x @ (I + ε); applied per frame
                eps = 0.5 * (strain + jnp.swapaxes(strain, -1, -2))
                eps_atoms = jnp.take(eps, batch, axis=0)  # [N, 3, 3]
                d[keys.POSITIONS] = pos_in + jnp.einsum(
                    "ni,nij->nj", pos_in, eps_atoms, precision="highest"
                )
                d[keys.CELL] = cell + jnp.einsum(
                    "fij,fjk->fik", cell, eps, precision="highest"
                )
                # force recompute of geometry from the strained inputs
                d.pop(keys.EDGE_VECTORS, None)
                d.pop(keys.EDGE_LENGTH, None)
                out_d = apply_fn(params, d)
                return _masked_total(out_d), out_d

            strain0 = jnp.zeros((cell.shape[0], 3, 3), dtype=pos.dtype)
            grads, out = jax.grad(energy_of, argnums=(0, 1), has_aux=True)(pos, strain0)
            de_dpos, de_deps = grads
        else:

            def energy_of(pos_in):
                d = dict(data)
                d[keys.POSITIONS] = pos_in
                d.pop(keys.EDGE_VECTORS, None)
                d.pop(keys.EDGE_LENGTH, None)
                out_d = apply_fn(params, d)
                return _masked_total(out_d), out_d

            de_dpos, out = jax.grad(energy_of, has_aux=True)(pos)
            de_deps = None
        out = dict(out)
        forces = -de_dpos
        if keys.NODE_MASK in data:
            forces = forces * data[keys.NODE_MASK].astype(forces.dtype)[:, None]
        out[keys.FORCES] = forces
        if do_stress:
            volume = jnp.abs(jnp.linalg.det(cell))  # [F]
            out[keys.VIRIAL] = -de_deps
            out[keys.STRESS] = de_deps / jnp.maximum(volume, 1e-12)[:, None, None]
        return out

    return wrapped
