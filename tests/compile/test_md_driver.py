"""Native C++ MD driver (csrc/md_driver.cpp) tests.

The driver is the fully-native pair_allegro role (reference README.md:43-45,
docs/guide/lammps.md): it consumes `.atpu` artifacts through the PJRT C API
and runs velocity-Verlet MD with C++ cell-list re-neighboring.

- ``--selftest`` covers the artifact-free native pieces (zip/npy parsing,
  neighbor list, integrator energy conservation on an analytic dimer).
- The full parity check (driver trajectory vs the Python ``Simulation`` on a
  real PJRT device) lives in ``scripts/check_md_driver.py``; the subprocess
  test here runs it only when a PJRT plugin is available (slow: two device
  compiles through the plugin).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_PLUGIN = "/opt/axon/libaxon_pjrt.so"


def _binary():
    from allegro_tpu.native.md_driver import build_md_driver

    return build_md_driver()


@pytest.mark.slow
def test_md_driver_builds_and_selftests():
    binary = _binary()
    if binary is None:
        pytest.skip("no C++ toolchain / PJRT headers available")
    r = subprocess.run([binary, "--selftest"], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "selftest OK" in r.stdout + r.stderr


@pytest.mark.slow
def test_md_driver_trajectory_parity_vs_python():
    """Driver-vs-Python trajectory parity on a real PJRT device (the
    reference's compile-consistency role, tests/model/test_allegro.py:206-267,
    for the fully-native path)."""
    if not os.path.exists(_PLUGIN):
        pytest.skip("no PJRT plugin on this host")
    if _binary() is None:
        pytest.skip("no C++ toolchain / PJRT headers available")
    env = dict(os.environ)
    # the check drives the real chip — undo the CPU-platform pin from conftest
    env.pop("JAX_PLATFORMS", None)
    # tunnel outages should SKIP, not fail: probe device reachability first
    # (a fresh subprocess — this process is pinned to CPU by conftest)
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            capture_output=True, timeout=240, env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("PJRT device unreachable (tunnel down): probe timed out")
    if probe.returncode != 0:
        pytest.skip(
            f"PJRT device unreachable: {probe.stderr.decode()[-200:]}"
        )
    from allegro_tpu.utils.chiplock import chip_lock

    with chip_lock(timeout=3600):
        env["ALLEGRO_CHIP_LOCK_HELD"] = "1"  # child inherits ownership
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "check_md_driver.py")],
            capture_output=True,
            text=True,
            timeout=1800,
            env=env,
            cwd=REPO,
        )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    assert "MD driver parity OK" in r.stdout
