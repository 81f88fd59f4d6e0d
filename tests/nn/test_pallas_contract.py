"""Pallas TP kernel consistency vs the XLA reference path (interpret mode on
CPU — the analogue of the reference's kernel-vs-Contracter tests,
``tests/nn/test_contract_kernels.py``, tolerances from
``tests/model/test_allegro.py:72-74``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import allegro_tpu.ops.pallas_contract as pc
from allegro_tpu.lib.irreps import Irreps
from allegro_tpu.nn.contract import Contracter


@pytest.fixture(autouse=True)
def _interpret_mode():
    pc.INTERPRET = True
    yield
    pc.INTERPRET = False


IRREPS_GRID = [
    ("1x0e+1x1o", "1x0e+1x1o", "1x0e+1x1o"),
    ("1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e"),
    ("1x0e+1x1o+1x2e", "1x0e+1x1o+1x2e", "1x0e"),
]


def _pair(irr, coupling, mul, scatter_factor=0.3):
    kw = dict(
        irreps_in1=irr[0], irreps_in2=irr[1], irreps_out=irr[2],
        mul=mul, path_channel_coupling=coupling, scatter_factor=scatter_factor,
        param_dtype=jnp.float32,
    )
    return (
        Contracter(**kw, kernel_backend="einsum"),
        Contracter(**kw, kernel_backend="pallas"),
    )


@pytest.mark.parametrize("irr", IRREPS_GRID)
@pytest.mark.parametrize("coupling", [True, False])
def test_forward_consistency(irr, coupling, rng):
    mul = 8
    ref, ker = _pair(irr, coupling, mul)
    E, n_atoms = 12, 4
    x1 = jnp.asarray(rng.randn(E, mul, Irreps(irr[0]).dim), jnp.float32)
    x2 = jnp.asarray(rng.randn(E, mul, Irreps(irr[1]).dim), jnp.float32)
    centers = jnp.asarray(rng.randint(0, n_atoms, E), jnp.int32)
    params = ref.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)
    out_ref = ref.apply(params, x1, x2, centers, n_atoms)
    out_ker = ker.apply(params, x1, x2, centers, n_atoms)  # same param pytree
    np.testing.assert_allclose(np.asarray(out_ker), np.asarray(out_ref), atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("coupling", [True, False])
def test_gradient_consistency(coupling, rng):
    irr = IRREPS_GRID[1]
    mul = 8
    ref, ker = _pair(irr, coupling, mul)
    E, n_atoms = 10, 3
    x1 = jnp.asarray(rng.randn(E, mul, 9), jnp.float32)
    x2 = jnp.asarray(rng.randn(E, mul, 9), jnp.float32)
    centers = jnp.asarray(rng.randint(0, n_atoms, E), jnp.int32)
    params = ref.init(jax.random.PRNGKey(0), x1, x2, centers, n_atoms)

    def loss(mod):
        def f(p, a, b):
            out = mod.apply(p, a, b, centers, n_atoms)
            return jnp.sum(out * out)
        return f

    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(params, x1, x2)
    g_ker = jax.grad(loss(ker), argnums=(0, 1, 2))(params, x1, x2)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4)


def test_entry_permutations():
    from allegro_tpu.nn.contract import pack_w3j, enumerate_instructions
    from allegro_tpu.ops.pallas_contract import sparse_entries, _permute_entries

    i1 = Irreps("1x0e+1x1o")
    ins = enumerate_instructions(i1, i1, i1)
    w3j = pack_w3j(i1, i1, i1, ins)
    e = sparse_entries(w3j)
    assert len(e) > 0
    b1 = _permute_entries(e, "bwd1")
    assert sorted((i, j, k) for i, j, k, _, _ in e) == sorted(
        (k, j, i) for i, j, k, _, _ in b1
    )
