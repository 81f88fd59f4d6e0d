"""Build helper for the native C++ MD driver (csrc/md_driver.cpp).

The binary is the fully-native pair_allegro role: it consumes ``.atpu``
artifacts through the PJRT C API (any plugin — libaxon_pjrt.so, libtpu.so, a
CPU plugin) with the cell-list neighbor list and a velocity-Verlet integrator
in C++. The PJRT C API header ships inside the installed tensorflow package;
no other dependency.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
from typing import Optional

_CSRC = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "csrc"))


def _pjrt_include_dir() -> Optional[str]:
    candidates = []
    try:
        import tensorflow  # noqa: F401 — only for the path

        candidates.append(
            os.path.join(os.path.dirname(tensorflow.__file__), "include")
        )
    except Exception:
        pass
    for root in ("/opt/venv/lib", "/usr/lib", "/usr/local/lib"):
        for pyv in ("python3.12", "python3.11", "python3.10"):
            candidates.append(
                os.path.join(root, pyv, "site-packages", "tensorflow", "include")
            )
    for c in candidates:
        if os.path.exists(os.path.join(c, "xla", "pjrt", "c", "pjrt_c_api.h")):
            return c
    return None


def build_md_driver(force: bool = False) -> Optional[str]:
    """Compile allegro_md into the user cache; returns the binary path."""
    srcs = [os.path.join(_CSRC, "md_driver.cpp"), os.path.join(_CSRC, "neighborlist.cpp")]
    if not all(os.path.exists(s) for s in srcs):
        return None
    inc = _pjrt_include_dir()
    if inc is None:
        return None
    h = hashlib.sha256()
    for s in srcs:
        with open(s, "rb") as f:
            h.update(f.read())
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "allegro_tpu"
    )
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, f"allegro_md_{h.hexdigest()[:16]}")
    if os.path.exists(out) and not force:
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-fopenmp", f"-I{inc}",
        *srcs, "-ldl", "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, out)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        raise RuntimeError(
            f"allegro_md build failed:\n{e.stderr.decode()[-3000:]}"
        ) from e
    return out


if __name__ == "__main__":
    path = build_md_driver(force=True)
    print(path or "BUILD UNAVAILABLE (missing toolchain or pjrt_c_api.h)")
