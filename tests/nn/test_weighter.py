"""MakeWeightedChannels unit tests (reference analogue:
``tests/nn/test_weighter.py`` — equivariance + oracle formula)."""

import numpy as np
import jax.numpy as jnp
import pytest

from allegro_tpu.lib.irreps import Irreps
from allegro_tpu.lib.testing import transform_strided
from allegro_tpu.lib.wigner import rand_rotation
from allegro_tpu.nn.channels import MakeWeightedChannels

IRR = Irreps("1x0e+1x1o+1x2e")


def test_oracle_formula(rng):
    """out[z,u,d] = attr[z,d] * w[z,irrep_of(d),u] — direct check.

    Weight columns are irrep-major (``reshape(E, n_irr, mul)``), the layout
    the fused kernels consume without a transpose."""
    E, mul = 7, 5
    wt = MakeWeightedChannels(IRR, mul, weight_individual_irreps=True)
    attr = rng.randn(E, IRR.dim)
    w = rng.randn(E, wt.weight_numel)
    out = np.asarray(wt(jnp.asarray(attr), jnp.asarray(w)))
    w3 = w.reshape(E, len(IRR), mul)
    expected = np.zeros((E, mul, IRR.dim))
    for k, sl in enumerate(IRR.slices()):
        expected[:, :, sl] = attr[:, None, sl] * w3[:, k, :, None]
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_single_weight_mode(rng):
    E, mul = 6, 4
    wt = MakeWeightedChannels(IRR, mul, weight_individual_irreps=False)
    assert wt.weight_numel == mul
    attr = rng.randn(E, IRR.dim)
    w = rng.randn(E, mul)
    out = np.asarray(wt(jnp.asarray(attr), jnp.asarray(w)))
    np.testing.assert_allclose(out, attr[:, None, :] * w[:, :, None], atol=1e-12)


def test_equivariance(rng):
    """Weights are invariants → output transforms like the basis."""
    E, mul = 8, 3
    wt = MakeWeightedChannels(IRR, mul)
    attr = rng.randn(E, IRR.dim)
    w = rng.randn(E, wt.weight_numel)
    out = np.asarray(wt(jnp.asarray(attr), jnp.asarray(w)))
    R = rand_rotation(rng)
    attr_r = transform_strided(attr[:, None, :], IRR, R)[:, 0, :]
    out_r = np.asarray(wt(jnp.asarray(attr_r), jnp.asarray(w)))
    np.testing.assert_allclose(out_r, transform_strided(out, IRR, R), atol=1e-10)


def test_dim_major_consistency(rng):
    E, mul = 9, 4
    wt = MakeWeightedChannels(IRR, mul)
    attr = rng.randn(E, IRR.dim)
    w = rng.randn(E, wt.weight_numel)
    em = np.asarray(wt(jnp.asarray(attr), jnp.asarray(w)))
    dm = np.asarray(wt.dim_major(jnp.asarray(attr), jnp.asarray(w)))
    np.testing.assert_allclose(dm, np.transpose(em, (2, 0, 1)), atol=1e-12)
