"""Math substrate: O(3) irreps algebra, real spherical harmonics, Wigner 3j.

This replaces the role e3nn plays for the reference stack (cf.
``/root/reference/allegro/nn/_strided/_contract.py:4-5``) with a small,
self-contained, NumPy/JAX implementation whose conventions are fixed here and
validated numerically in ``tests/lib``.
"""

from .irreps import Irrep, MulIrrep, Irreps, tp_path_exists
from .spherical_harmonics import spherical_harmonics, sh_coefficients
from .wigner import wigner_3j, wigner_D, rand_rotation, rand_o3_matrix

__all__ = [
    "Irrep",
    "MulIrrep",
    "Irreps",
    "tp_path_exists",
    "spherical_harmonics",
    "sh_coefficients",
    "wigner_3j",
    "wigner_D",
    "rand_rotation",
    "rand_o3_matrix",
]
