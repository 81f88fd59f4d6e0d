import itertools

import numpy as np
import pytest

from allegro_tpu.lib.wigner import rand_rotation, wigner_3j, wigner_D

LMAX = 3


@pytest.mark.parametrize("l", range(LMAX + 1))
def test_wigner_D_orthogonal_and_homomorphic(l, rng):
    R1, R2 = rand_rotation(rng), rand_rotation(rng)
    D1, D2 = wigner_D(l, R1), wigner_D(l, R2)
    d = 2 * l + 1
    np.testing.assert_allclose(D1 @ D1.T, np.eye(d), atol=1e-9)
    np.testing.assert_allclose(wigner_D(l, R1 @ R2), D1 @ D2, atol=1e-9)


def test_wigner_D_identity():
    for l in range(LMAX + 1):
        np.testing.assert_allclose(
            wigner_D(l, np.eye(3)), np.eye(2 * l + 1), atol=1e-10
        )


@pytest.mark.parametrize(
    "l1,l2,l3",
    [t for t in itertools.product(range(LMAX + 1), repeat=3) if abs(t[0] - t[1]) <= t[2] <= t[0] + t[1]],
)
def test_wigner_3j_equivariance(l1, l2, l3, rng):
    C = wigner_3j(l1, l2, l3)
    assert abs(np.linalg.norm(C) - 1.0) < 1e-9
    for _ in range(2):
        R = rand_rotation(rng)
        D1, D2, D3 = wigner_D(l1, R), wigner_D(l2, R), wigner_D(l3, R)
        C_rot = np.einsum("il,jm,kn,lmn->ijk", D1, D2, D3, C)
        np.testing.assert_allclose(C_rot, C, atol=1e-8)


def test_wigner_3j_triangle_zero():
    assert np.all(wigner_3j(0, 0, 1) == 0)
    assert np.all(wigner_3j(1, 1, 3) == 0)


def test_wigner_3j_known_values():
    # 0x0->0: scalar product, must be the 1x1x1 identity
    np.testing.assert_allclose(wigner_3j(0, 0, 0), np.ones((1, 1, 1)))
    # 1x1->0: proportional to the identity (dot product), norm 1
    C = wigner_3j(1, 1, 0)[:, :, 0]
    np.testing.assert_allclose(C, np.eye(3) / np.sqrt(3.0), atol=1e-9)
    # 1x1->1: proportional to the Levi-Civita tensor (cross product)
    C = wigner_3j(1, 1, 1)
    E = np.zeros((3, 3, 3))
    for i, j, k in itertools.permutations(range(3)):
        sign = np.sign(np.linalg.det(np.eye(3)[[i, j, k]]))
        E[i, j, k] = sign
    E /= np.linalg.norm(E)
    scale = C.flatten() @ E.flatten()
    np.testing.assert_allclose(C, scale * E, atol=1e-9)
    assert abs(abs(scale) - 1.0) < 1e-9


def test_wigner_3j_permutation_symmetry(rng):
    # uniqueness → permuted tensors agree up to sign
    C = wigner_3j(1, 2, 3)
    Cp = wigner_3j(2, 1, 3)
    a = C.transpose(1, 0, 2).flatten()
    b = Cp.flatten()
    assert abs(abs(a @ b) - 1.0) < 1e-8
