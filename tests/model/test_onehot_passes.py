"""Accuracy pin for the 2-pass bf16 one-hot split (the driver-bench headline
precision policy).

The fused kernels' one-hot MXU gathers/scatters split f32 operands into bf16
passes: 3 passes reproduce exact f32 (the library default), 2 passes trade
the smallest term for ~2/3 the MXU cost. ``bench.py`` opts into 2 passes for
the headline metric, so its accuracy must be pinned the same way the bf16
tensor-track storage is (``test_bf16_storage.py``): flagship-shaped f32 model
vs the float64 einsum oracle, explicit relative force tolerance. Measured
error is ~7.6e-6 rel; the pin is 3e-5 — still 1.7x tighter than the
reference's own f32 compiled-model tolerance of 5e-5
(``/root/reference/tests/model/test_allegro.py:72-74``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import allegro_tpu.ops.fused_tp as fused_tp
from allegro_tpu.data import keys

from test_bf16_storage import _crystal_data, _flagship_model  # noqa: E402 (sibling test module)

pytestmark = pytest.mark.slow

TWO_PASS_REL_FORCE_TOL = 3e-5


@pytest.fixture(autouse=True)
def _interpret_mode():
    fused_tp.INTERPRET = True
    yield
    fused_tp.INTERPRET = False


@pytest.fixture
def _two_pass():
    old = fused_tp.ONEHOT_PASSES
    fused_tp.ONEHOT_PASSES = 2
    yield
    fused_tp.ONEHOT_PASSES = old


@pytest.mark.parametrize("backend", ["fused", "fused_infer"])
def test_two_pass_onehot_force_accuracy_vs_f64_oracle(backend, _two_pass):
    oracle = _flagship_model("einsum", model_dtype="float64")
    fast = _flagship_model(backend)
    data64 = _crystal_data(np.float64)
    data32 = _crystal_data(np.float32)
    params = oracle.init(0, data64)
    out_ref = oracle(params, data64)
    params32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, params
    )
    out_fast = fast(params32, data32)
    f_ref = np.asarray(out_ref[keys.FORCES], dtype=np.float64)
    f = np.asarray(out_fast[keys.FORCES], dtype=np.float64)
    scale = max(float(np.abs(f_ref).max()), 1e-3)
    max_rel = float(np.abs(f - f_ref).max()) / scale
    assert max_rel < TWO_PASS_REL_FORCE_TOL, f"2-pass max rel force err {max_rel:.3e}"
    e_ref = float(np.asarray(out_ref[keys.TOTAL_ENERGY]).sum())
    e = float(np.asarray(out_fast[keys.TOTAL_ENERGY]).sum())
    assert abs(e - e_ref) / max(abs(e_ref), 1e-3) < TWO_PASS_REL_FORCE_TOL

    # non-vacuity guard (ADVICE r3 high): the 2-pass path must actually
    # DIVERGE from the exact 3-pass path — if a future change routes interpret
    # mode back to the exact single-pass branch regardless of ONEHOT_PASSES,
    # the accuracy pin above would silently stop testing the reduced policy.
    fused_tp.ONEHOT_PASSES = 3
    out_exact = fast(params32, data32)
    f_exact = np.asarray(out_exact[keys.FORCES], dtype=np.float64)
    fused_tp.ONEHOT_PASSES = 2
    div = float(np.abs(f - f_exact).max()) / scale
    assert div > 1e-9, (
        f"2-pass forces identical to 3-pass (max rel dev {div:.2e}) — the "
        "reduced-pass policy is not being exercised under interpret mode"
    )
