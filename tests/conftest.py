"""Test configuration: force CPU with 8 virtual devices and enable x64.

Mirrors the reference's CI hygiene (deterministic seeds, CPU-only public
runners — ``/root/reference/.github/workflows/tests.yaml:15-22,70``) and gives
every test session a virtual 8-device mesh for multi-chip sharding tests.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os
import sys

# Tests run CPU-only: drop the TPU-tunnel plugin from the path (its discovery
# can block for minutes even under JAX_PLATFORMS=cpu).
sys.path = [p for p in sys.path if ".axon_site" not in p]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A TPU-tunnel sitecustomize (loaded via PYTHONPATH before this file) may PIN
# jax_platforms programmatically at interpreter startup — the JAX_PLATFORMS
# env var above cannot override a prior config.update. Re-pin to CPU here,
# before any backend initializes, so the 8-device virtual mesh is real
# (otherwise every test silently runs on the 1-chip TPU tunnel: minutes-long
# remote compiles AND a 1-device mesh that voids all multi-device coverage).
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Persistent XLA compilation cache: the test suite is compile-bound on a
# small CI host (every jitted model/MD block is a fresh XLA compile).
# Caching compiles across runs turns re-verification from hours into minutes.
_cache_dir = os.environ.get(
    "ALLEGRO_TEST_CACHE", os.path.expanduser("~/.cache/allegro_tpu/xla_test_cache")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

jax.config.update("jax_enable_x64", True)
# Reference-parity numerics: the reference defaults to allow_tf32=False
# (full-f32 matmuls, /root/reference/configs/tutorial.yaml:166-167). Recent JAX
# builds default f32 matmuls/einsums to bf16-multiply semantics (~1e-3 rel err)
# even on CPU, which breaks every 5e-5-tolerance consistency test. Pin highest.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow tests (interpret-mode Pallas, model batteries)")
    config.addinivalue_line("markers", "fast: fast tier (< 5 min total on 1 CPU)")


def pytest_collection_modifyitems(config, items):
    """Everything not marked slow is the fast tier: `pytest -m fast`."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
