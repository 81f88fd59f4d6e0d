"""Molecular dynamics engine.

TPU-native counterpart of the reference's LAMMPS ``pair_allegro`` deployment
path (SURVEY.md §3.4): a jitted integrator loop over the model's forces, with
host-side re-neighboring into sticky padded buckets (no recompiles), and a
multi-chip mode that shards the edge set over a device mesh and lets XLA
all-reduce the force contributions — the ICI-native analogue of pair_allegro's
MPI spatial decomposition, exploiting the same strict locality.
"""

from .simulation import (
    MDState,
    Simulation,
    kinetic_energy,
    maxwell_boltzmann_velocities,
    temperature,
)

__all__ = [
    "MDState",
    "Simulation",
    "kinetic_energy",
    "maxwell_boltzmann_velocities",
    "temperature",
]
