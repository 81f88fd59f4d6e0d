"""ZBL universal repulsive pair potential.

Role of ``nequip.nn.pair_potential.ZBL`` consumed by the reference config
(``configs/tutorial.yaml:160-163``, applied in the builder at
``allegro/model/allegro_models.py:270-288`` with a polynomial cutoff
envelope): a short-range screened-Coulomb repulsion added to the per-atom
energies, parameter-free given the atomic numbers.

Standard ZBL form (metal units: eV, Å):
  V(r) = (14.399645 eV·Å) * Z1*Z2 / r * φ(r/a),
  a = 0.46850 / (Z1^0.23 + Z2^0.23),
  φ(x) = 0.18175 e^{-3.19980x} + 0.50986 e^{-0.94229x}
       + 0.28022 e^{-0.40290x} + 0.02817 e^{-0.20162x}
Each directed edge contributes half (pairs appear twice).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data import keys
from .cutoffs import PolynomialCutoff
from .edge_geometry import with_edge_vectors

_COULOMB_EV_ANG = 14.399645478425668  # e^2 / (4 pi eps0) in eV·Å


class ZBLPairPotential:
    """Stateless: adds ZBL pair energy to PER_ATOM_ENERGY."""

    def __init__(
        self,
        type_to_Z: Sequence[int],
        r_max: float,
        polynomial_cutoff_p: int = 6,
    ):
        self.type_to_Z = np.asarray(type_to_Z, dtype=np.float64)
        self.r_max = float(r_max)
        self.cutoff = PolynomialCutoff(polynomial_cutoff_p)

    def __call__(self, data: Dict) -> Dict:
        data = with_edge_vectors(data)
        r = data[keys.EDGE_LENGTH][:, 0]
        dtype = data[keys.PER_ATOM_ENERGY].dtype
        centers, neighbors = data[keys.EDGE_INDEX][0], data[keys.EDGE_INDEX][1]
        types = data[keys.ATOM_TYPES]
        Z = jnp.asarray(self.type_to_Z, dtype=r.dtype)
        Zi = jnp.take(Z, jnp.take(types, centers, mode="clip"))
        Zj = jnp.take(Z, jnp.take(types, neighbors, mode="clip"))
        a = 0.46850 / (Zi**0.23 + Zj**0.23)
        r_safe = jnp.maximum(r, 1e-6)
        x = r_safe / a
        phi = (
            0.18175 * jnp.exp(-3.19980 * x)
            + 0.50986 * jnp.exp(-0.94229 * x)
            + 0.28022 * jnp.exp(-0.40290 * x)
            + 0.02817 * jnp.exp(-0.20162 * x)
        )
        v = _COULOMB_EV_ANG * Zi * Zj / r_safe * phi
        env = self.cutoff(r / self.r_max)
        mask = data[keys.EDGE_MASK].astype(r.dtype) if keys.EDGE_MASK in data else 1.0
        e_edge = (0.5 * v * env * mask).astype(dtype)[:, None]
        n_atoms = data[keys.POSITIONS].shape[0]
        e_atom = jax.ops.segment_sum(e_edge, centers, num_segments=n_atoms)
        out = dict(data)
        out[keys.PER_ATOM_ENERGY] = data[keys.PER_ATOM_ENERGY] + e_atom
        return out
