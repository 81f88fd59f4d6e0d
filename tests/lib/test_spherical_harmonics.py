import numpy as np
import jax.numpy as jnp
import pytest

from allegro_tpu.lib import spherical_harmonics
from allegro_tpu.lib.wigner import rand_rotation, wigner_D

LMAX = 4


def _unit(rng, n):
    v = rng.randn(n, 3)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_l0_l1_closed_forms(rng):
    v = _unit(rng, 16)
    y = np.asarray(spherical_harmonics(1, jnp.asarray(v)))
    np.testing.assert_allclose(y[:, 0], 1.0, atol=1e-12)
    # component normalization, (y, z, x) ordering for l=1
    np.testing.assert_allclose(
        y[:, 1:4], np.sqrt(3.0) * v[:, [1, 2, 0]], atol=1e-12
    )


def test_component_normalization(rng):
    v = _unit(rng, 64)
    y = np.asarray(spherical_harmonics(LMAX, jnp.asarray(v)))
    i = 0
    for l in range(LMAX + 1):
        d = 2 * l + 1
        norms = np.sum(y[:, i : i + d] ** 2, axis=1)
        np.testing.assert_allclose(norms, d, atol=1e-9)
        i += d


def test_orthogonality(rng):
    # mean over sphere of Y_i Y_j = delta_ij (component normalization)
    v = _unit(rng, 400000)
    y = np.asarray(spherical_harmonics(3, jnp.asarray(v)))
    gram = (y.T @ y) / v.shape[0]
    np.testing.assert_allclose(gram, np.eye(y.shape[1]), atol=0.02)


def test_normalize_flag(rng):
    v = rng.randn(8, 3) * 5.0
    a = np.asarray(spherical_harmonics(2, jnp.asarray(v), normalize=True))
    vu = v / np.linalg.norm(v, axis=1, keepdims=True)
    b = np.asarray(spherical_harmonics(2, jnp.asarray(vu), normalize=False))
    np.testing.assert_allclose(a, b, atol=1e-10)


def test_zero_vector_padding():
    v = jnp.zeros((3, 3))
    y = np.asarray(spherical_harmonics(2, v))
    np.testing.assert_allclose(y[:, 0], 1.0)
    np.testing.assert_allclose(y[:, 1:], 0.0)


@pytest.mark.parametrize("l", range(1, LMAX + 1))
def test_equivariance(l, rng):
    v = _unit(rng, 32)
    R = rand_rotation(rng)
    D = wigner_D(l, R)
    y_rot = np.asarray(spherical_harmonics([l], jnp.asarray(v @ R.T)))
    y = np.asarray(spherical_harmonics([l], jnp.asarray(v)))
    np.testing.assert_allclose(y_rot, y @ D.T, atol=1e-9)


@pytest.mark.parametrize("l", range(1, LMAX + 1))
def test_parity(l, rng):
    v = _unit(rng, 16)
    y_inv = np.asarray(spherical_harmonics([l], jnp.asarray(-v)))
    y = np.asarray(spherical_harmonics([l], jnp.asarray(v)))
    np.testing.assert_allclose(y_inv, ((-1.0) ** l) * y, atol=1e-10)
