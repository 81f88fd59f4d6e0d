"""TRUE cross-implementation parity: run the actual reference PyTorch modules
as oracles against our JAX re-implementations.

The reference package (``/root/reference``) depends on nequip/e3nn, which are
not installed — but ``allegro/nn/spline.py`` and
``allegro/nn/_strided/_channels.py`` only need two trivially-stubbable
symbols from them (the ``compile_mode`` class decorator and
``_GLOBAL_DTYPE``). We load those two files directly (importlib, no package
import) with the stubs in place and compare outputs element-for-element at
float64. This is the strongest parity evidence available in this environment:
not a within-repo self-oracle, the reference's own forward code.

Skipped cleanly when the reference checkout or torch is absent.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "allegro", "nn")),
    reason="reference checkout not available",
)


def _load_ref_module(relpath, name):
    """Import one reference source file with e3nn/nequip stubs in place."""
    stubs = {}

    def stub(modname, **attrs):
        m = types.ModuleType(modname)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[modname] = m

    # e3nn.util.jit.compile_mode: decorator factory, identity is enough
    stub("e3nn"), stub("e3nn.util")
    stub("e3nn.util.jit", compile_mode=lambda mode: (lambda cls: cls))
    # nequip.utils.global_dtype._GLOBAL_DTYPE: the reference pins float64
    stub("nequip"), stub("nequip.utils")
    stub("nequip.utils.global_dtype", _GLOBAL_DTYPE=torch.float64)

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, relpath)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# ---------------------------------------------------------------------------
# PerClassSpline (reference allegro/nn/spline.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("K,span", [(8, 3), (16, 12), (5, 0), (6, 6)])
def test_spline_basis_vs_reference(K, span):
    ref_mod = _load_ref_module("allegro/nn/spline.py", "_ref_spline")
    from allegro_tpu.nn.spline import spline_basis

    ref = ref_mod.PerClassSpline(
        num_classes=1, num_channels=1, num_splines=K, spline_span=span,
        dtype=torch.float64,
    )
    # cover interior, grid points, both boundaries, and out-of-support x
    x = np.concatenate(
        [np.linspace(-0.2, 1.3, 301), np.arange(K + 1) / K]
    ).astype(np.float64)
    b_ref = ref._get_basis(torch.from_numpy(x[:, None])).numpy()
    b_jax = np.asarray(spline_basis(x, K, span))
    np.testing.assert_allclose(b_jax, b_ref, atol=1e-14, rtol=1e-14)
    # the embedding must vanish identically at/after the cutoff (MD
    # continuity across re-neighboring events)
    assert np.all(b_jax[x >= 1.0] == 0.0)


def test_per_class_spline_vs_reference():
    import jax

    ref_mod = _load_ref_module("allegro/nn/spline.py", "_ref_spline")
    from allegro_tpu.nn.spline import PerClassSpline

    C, CH, K, span, E = 4, 8, 16, 12, 64
    ref = ref_mod.PerClassSpline(
        num_classes=C, num_channels=CH, num_splines=K, spline_span=span,
        dtype=torch.float64,
    )
    rng = np.random.RandomState(0)
    w = rng.randn(C, CH, K)
    with torch.no_grad():
        ref.class_embed.weight.copy_(torch.from_numpy(w.reshape(C, CH * K)))

    x = rng.rand(E)
    cls = rng.randint(0, C, E)
    out_ref = ref(
        torch.from_numpy(x[:, None]), torch.from_numpy(cls)
    ).detach().numpy()

    ours = PerClassSpline(
        num_classes=C, channels=CH, num_splines=K, spline_span=span,
        param_dtype=np.float64,
    )
    params = {"params": {"spline_weights": w}}
    out_jax = np.asarray(
        ours.apply(params, x.astype(np.float64), cls.astype(np.int32))
    )
    np.testing.assert_allclose(out_jax, out_ref, atol=1e-13, rtol=1e-12)
    # and the gradient w.r.t. x (force path) agrees
    xt = torch.from_numpy(x[:, None]).requires_grad_(True)
    ref(xt, torch.from_numpy(cls)).sum().backward()
    g_ref = xt.grad.numpy()[:, 0]
    g_jax = np.asarray(
        jax.grad(
            lambda xx: ours.apply(params, xx, cls.astype(np.int32)).sum()
        )(x.astype(np.float64))
    )
    np.testing.assert_allclose(g_jax, g_ref, atol=1e-12, rtol=1e-11)


# ---------------------------------------------------------------------------
# MakeWeightedChannels (reference allegro/nn/_strided/_channels.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("individual", [True, False])
def test_weighted_channels_vs_reference(individual):
    ref_mod = _load_ref_module(
        "allegro/nn/_strided/_channels.py", "_ref_channels"
    )
    from allegro_tpu.lib.irreps import Irreps
    from allegro_tpu.nn.channels import MakeWeightedChannels

    irreps = Irreps("0e + 1o + 2e")  # dim 9, 3 irreps
    U, E = 8, 32
    # our Irreps satisfies the reference's interface: iteration of
    # (mul, ir) pairs, len(), .dim, .slices()
    ref = ref_mod.MakeWeightedChannels(
        irreps, U, weight_individual_irreps=individual
    ).double()
    ours = MakeWeightedChannels(irreps, U, weight_individual_irreps=individual)
    assert ours.weight_numel == ref.weight_numel

    rng = np.random.RandomState(1)
    sh = rng.randn(E, irreps.dim)
    if individual:
        # reference weights are mul-major [E, U, n_irr]; ours irrep-major
        # [E, n_irr, U] (a documented fixed permutation of learned columns)
        w_mulmajor = rng.randn(E, U, len(irreps))
        w_ref = torch.from_numpy(w_mulmajor.reshape(E, -1))
        w_ours = np.ascontiguousarray(
            w_mulmajor.transpose(0, 2, 1)
        ).reshape(E, -1)
    else:
        w_ours = rng.randn(E, U)
        w_ref = torch.from_numpy(w_ours)

    out_ref = ref(torch.from_numpy(sh), w_ref).numpy()  # [E, U, dim]
    out_ours = np.asarray(ours(sh, w_ours))
    np.testing.assert_allclose(out_ours, out_ref, atol=1e-14, rtol=1e-14)
    # the fused-kernel flat dim-major layout is the same tensor, re-laid-out
    flat = np.asarray(ours.flat_dim_major(sh, w_ours))  # [E, dim*U]
    np.testing.assert_allclose(
        flat.reshape(E, irreps.dim, U).transpose(0, 2, 1), out_ref,
        atol=1e-14, rtol=1e-14,
    )
