"""Contracter unit tests: equivariance, gradients, env-sum semantics.

Mirrors the reference TP test strategy (``tests/nn/test_contract_basic.py``):
randomized O(3) equivariance over an irreps grid and both coupling modes, and
float64 gradient checks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax._src import test_util as jtu

from allegro_tpu.lib.irreps import Irreps
from allegro_tpu.lib.testing import transform_strided
from allegro_tpu.lib.wigner import rand_rotation
from allegro_tpu.nn.contract import Contracter

IRREPS_GRID = [
    ("1x0e", "1x0e", "1x0e"),
    ("1x0e+1x1o", "1x0e+1x1o", "1x0e+1x1o"),
    ("1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e"),
    ("1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e", "1x0e"),
    ("1x0e+1x1o+1x2e+1x3o", "1x0e+1x1o+1x2e+1x3o", "1x0e+1x0o+1x1e+1x1o+1x2e+1x2o"),
]


def _make(irr, coupling, mul=4, scatter_factor=None):
    return Contracter(
        irreps_in1=irr[0],
        irreps_in2=irr[1],
        irreps_out=irr[2],
        mul=mul,
        path_channel_coupling=coupling,
        scatter_factor=scatter_factor,
        param_dtype=jnp.float64,
    )


def _random_inputs(rng, irr, mul=4, E=6, n_atoms=3):
    x1 = rng.randn(E, mul, Irreps(irr[0]).dim)
    x2 = rng.randn(E, mul, Irreps(irr[1]).dim)
    centers = rng.randint(0, n_atoms, size=E).astype(np.int32)
    return x1, x2, centers, n_atoms


@pytest.mark.parametrize("irr", IRREPS_GRID)
@pytest.mark.parametrize("coupling", [True, False])
def test_equivariance(irr, coupling, rng):
    c = _make(irr, coupling)
    x1, x2, centers, n_atoms = _random_inputs(rng, irr)
    params = c.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)
    out = np.asarray(c.apply(params, x1, x2, centers, n_atoms))
    for parity in (1, -1):
        R = rand_rotation(rng)
        x1r = transform_strided(x1, irr[0], R, parity)
        x2r = transform_strided(x2, irr[1], R, parity)
        out_r = np.asarray(c.apply(params, x1r, x2r, centers, n_atoms))
        np.testing.assert_allclose(
            out_r, transform_strided(out, irr[2], R, parity), atol=1e-8
        )


@pytest.mark.parametrize("coupling", [True, False])
def test_gradcheck(coupling, rng):
    irr = ("1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e", "1x0e+1x1o")
    c = _make(irr, coupling, mul=2)
    x1, x2, centers, n_atoms = _random_inputs(rng, irr, mul=2, E=4)
    params = c.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)
    f = lambda a, b: c.apply(params, a, b, centers, n_atoms)
    jtu.check_grads(f, (jnp.asarray(x1), jnp.asarray(x2)), order=1, atol=1e-6, rtol=1e-6)


def test_env_sum_semantics(rng):
    """The fused scatter/gather equals an explicit environment sum."""
    irr = ("1x0e+1x1o", "1x0e+1x1o", "1x0e+1x1o")
    factor = 0.5
    c = _make(irr, True, mul=2, scatter_factor=factor)
    x1, x2, centers, n_atoms = _random_inputs(rng, irr, mul=2, E=8, n_atoms=3)
    params = c.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)
    out = np.asarray(c.apply(params, x1, x2, centers, n_atoms))
    # manual env sum
    env = np.zeros((n_atoms,) + x2.shape[1:])
    for e, a in enumerate(centers):
        env[a] += factor * x2[e]
    x2_env = env[centers]
    out_manual = np.asarray(
        c.apply(params, x1, jnp.asarray(x2_env), centers, n_atoms, method=lambda m, a, b, *_: m.contract(a, b))
    )
    np.testing.assert_allclose(out, out_manual, atol=1e-10)


@pytest.mark.parametrize("coupling", [True, False])
def test_optimized_contract_matches_reference(coupling, rng):
    irr = ("1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e", "1x0e+1x0o+1x1e+1x1o+1x2e+1x2o")
    c = _make(irr, coupling)
    x1, x2, centers, n_atoms = _random_inputs(rng, irr)
    params = c.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)
    a = c.apply(params, x1, x2, method=lambda m, p, q: m.contract(p, q))
    b = c.apply(params, x1, x2, method=lambda m, p, q: m.contract_reference(p, q))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_scalar_path_is_product(rng):
    """0e x 0e -> 0e with a single path reduces to w * x1 * x2 (env-summed)."""
    irr = ("1x0e", "1x0e", "1x0e")
    c = _make(irr, False, mul=3)
    x1, x2, centers, n_atoms = _random_inputs(rng, irr, mul=3, E=5)
    params = c.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)
    w = float(params["params"]["path_weights"][0])
    out = np.asarray(c.apply(params, x1, x2, centers, n_atoms))
    env = np.zeros((n_atoms,) + x2.shape[1:])
    for e, a in enumerate(centers):
        env[a] += x2[e]
    np.testing.assert_allclose(out, w * x1 * env[centers], atol=1e-10)
