"""Equivariance test utilities.

Replaces e3nn's ``assert_equivariant`` role in the reference test suite
(``tests/nn/test_contract_basic.py:80-90``): apply random O(3) elements to
inputs/outputs via block-diagonal Wigner D matrices and compare.
"""

from __future__ import annotations

import numpy as np

from .irreps import Irreps
from .wigner import wigner_D


def rep_matrix(irreps, R: np.ndarray, parity_sign: int = 1) -> np.ndarray:
    """Block-diagonal representation matrix of O(3) element ``(parity, R)``
    acting on the (mul-free) basis of ``irreps``."""
    irreps = Irreps(irreps)
    blocks = []
    for mi in irreps:
        D = wigner_D(mi.ir.l, R)
        if parity_sign == -1:
            D = D * mi.ir.p
        for _ in range(mi.mul):
            blocks.append(D)
    out = np.zeros((irreps.dim, irreps.dim))
    i = 0
    for D in blocks:
        d = D.shape[0]
        out[i : i + d, i : i + d] = D
        i += d
    return out


def transform_strided(x, irreps, R: np.ndarray, parity_sign: int = 1):
    """Apply an O(3) element to a strided ``[..., mul, dim]`` feature array."""
    D = rep_matrix(irreps, R, parity_sign)
    return np.einsum("...d,kd->...k", np.asarray(x), D)
