"""allegro-tpu: a TPU-native framework for strictly-local E(3)-equivariant
machine-learning interatomic potentials (Allegro-class models).

Built from scratch in JAX/XLA/Pallas with the capability surface of the
reference ``mir-group/allegro`` + NequIP + ``pair_allegro`` stack
(see SURVEY.md): config-driven model building, end-to-end training with
energy/force/stress outputs via autodiff, fused tensor-product kernels over
padded static-shape neighbor lists, AOT-compiled inference artifacts, and
multi-chip molecular dynamics via spatial domain decomposition with ghost-atom
halo exchange expressed as XLA collectives.
"""

from ._version import __version__

__all__ = ["__version__"]
