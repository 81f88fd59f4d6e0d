"""Equivariant NN modules (flax.linen) operating on atomic data dicts.

TPU-native re-implementation of the reference's L1–L4 layers (SURVEY.md §1):
the nequip NN substrate (MLPs, reduces, scale/shift, sequential composition)
plus the Allegro equivariant stack (scalar/tensor two-body embeddings,
strided Clebsch–Gordan Contracter, env-channel weighter, Allegro layers).
"""

from .mlp import ScalarMLP
from .cutoffs import PolynomialCutoff, bessel_basis
from .channels import MakeWeightedChannels
from .contract import Contracter
from .sequential import SequentialGraphNet
from .edge_geometry import EdgeLengthNormalizer, with_edge_vectors
from .scalar_embed import (
    ProductTypeEmbedding,
    TwoBodyBesselScalarEmbed,
    TwoBodySplineScalarEmbed,
)
from .spline import PerClassSpline
from .tensor_embed import TwoBodySphericalHarmonicTensorEmbed
from .allegro import AllegroLayers
from .edgewise import EdgewiseReduce
from .atomwise import AtomwiseReduce, PerTypeScaleShift
from .pair_potential import ZBLPairPotential
from .grad import force_stress_wrapper

__all__ = [
    "ScalarMLP",
    "PolynomialCutoff",
    "bessel_basis",
    "MakeWeightedChannels",
    "Contracter",
    "SequentialGraphNet",
    "EdgeLengthNormalizer",
    "with_edge_vectors",
    "ProductTypeEmbedding",
    "TwoBodyBesselScalarEmbed",
    "TwoBodySplineScalarEmbed",
    "PerClassSpline",
    "TwoBodySphericalHarmonicTensorEmbed",
    "AllegroLayers",
    "EdgewiseReduce",
    "AtomwiseReduce",
    "PerTypeScaleShift",
    "ZBLPairPotential",
    "force_stress_wrapper",
]
