"""PerClassSpline unit tests (reference analogue: spline math in
``allegro/nn/spline.py`` — finite support, per-class weights, init variance)."""

import numpy as np
import jax
import jax.numpy as jnp

from allegro_tpu.nn.spline import PerClassSpline, spline_basis


def test_basis_finite_support():
    b = np.asarray(spline_basis(jnp.linspace(0, 1, 11), 8, span=1.0))
    assert b.shape == (11, 8)
    # bump k has support |x - k*h| < 2h
    h = 1.0 / 7
    xs = np.linspace(0, 1, 11)
    for i, x in enumerate(xs):
        for k in range(8):
            if abs(x - k * h) >= 2 * h:
                assert b[i, k] == 0.0


def test_basis_unit_variance_interior():
    xs = jnp.linspace(0.3, 0.7, 101)
    b = np.asarray(spline_basis(xs, 8, span=1.0))
    ssq = (b**2).sum(axis=1)
    np.testing.assert_allclose(ssq.mean(), 1.0, rtol=0.05)


def test_per_class_independence(rng):
    spl = PerClassSpline(num_classes=4, channels=3, num_splines=8, param_dtype=jnp.float64)
    x = jnp.asarray(rng.rand(10))
    cls = jnp.asarray(rng.randint(0, 4, 10), jnp.int32)
    params = spl.init(jax.random.PRNGKey(0), x, cls)
    out = np.asarray(spl.apply(params, x, cls))
    # same x, different class → different output (weights independent)
    out_a = np.asarray(spl.apply(params, x[:1], jnp.asarray([0], jnp.int32)))
    out_b = np.asarray(spl.apply(params, x[:1], jnp.asarray([1], jnp.int32)))
    assert not np.allclose(out_a, out_b)
    # class pattern consistent
    for e in range(10):
        ref = np.asarray(spl.apply(params, x[e : e + 1], cls[e : e + 1]))
        np.testing.assert_allclose(out[e], ref[0], atol=1e-12)


def test_output_variance_near_one(rng):
    """Unit-variance weights × normalized basis ≈ unit-variance outputs
    (the forward normalization the reference achieves with its init bound)."""
    spl = PerClassSpline(num_classes=1, channels=256, num_splines=8, param_dtype=jnp.float64)
    x = jnp.asarray(rng.rand(512) * 0.5 + 0.25)  # interior
    cls = jnp.zeros(512, jnp.int32)
    params = spl.init(jax.random.PRNGKey(1), x, cls)
    out = np.asarray(spl.apply(params, x, cls))
    assert 0.5 < out.var() < 2.0, out.var()
