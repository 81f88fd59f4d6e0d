"""Data model: atomic data dicts, neighbor lists, padding, datasets.

TPU-native replacement for the nequip data layer the reference consumes
(SURVEY.md §2.4): the same well-known-key data-dict semantics, but as a JAX
pytree with *static padded shapes* (SURVEY.md §7.1 item 1).
"""

from . import keys
from .atomic_data import (
    AtomsData,
    batch_frames,
    count_real_atoms,
    count_real_edges,
    num_frames,
    num_nodes,
    pad_data,
    round_up,
    to_jax,
)
from .neighborlist import neighbor_list, primitive_neighbor_list
from .datasets import InMemoryDataset, sgdml_npz_dataset, compute_statistics
from .dataloader import DataLoader

__all__ = [
    "keys",
    "AtomsData",
    "batch_frames",
    "count_real_atoms",
    "count_real_edges",
    "num_frames",
    "num_nodes",
    "pad_data",
    "round_up",
    "to_jax",
    "neighbor_list",
    "primitive_neighbor_list",
    "InMemoryDataset",
    "sgdml_npz_dataset",
    "compute_statistics",
    "DataLoader",
]
