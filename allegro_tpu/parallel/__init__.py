"""Multi-chip parallelism: device meshes, spatial domain decomposition.

The TPU-native counterpart of the reference stack's two parallel modes
(SURVEY.md §2.3): data-parallel training (see ``allegro_tpu.train.loop`` —
batch sharding over a mesh) and spatially domain-decomposed MD inference —
here as slab decomposition with ghost-atom halo exchange expressed as
``shard_map`` + ``ppermute`` over ICI, replacing pair_allegro's MPI ranks.
"""

from .brick import BrickDecomposition
from .domain import SlabDecomposition

__all__ = ["BrickDecomposition", "SlabDecomposition"]
