"""ctypes binding for the C++ cell-list neighbor list (csrc/neighborlist.cpp).

Compiled lazily with g++ -O3 into a per-user cache; falls back cleanly when
no toolchain is available (``native_available()`` is False and the scipy
implementation in ``allegro_tpu.data.neighborlist`` is used instead).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "neighborlist.cpp")


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "allegro_tpu"
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"neighborlist_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-fopenmp", src, "-o", tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.atpu_neighbor_list.restype = ctypes.c_longlong
    lib.atpu_neighbor_list.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # pos
        ctypes.c_longlong,  # n
        ctypes.POINTER(ctypes.c_double),  # cell
        ctypes.POINTER(ctypes.c_int),  # pbc
        ctypes.c_double,  # r_max
        ctypes.c_longlong,  # cap
        ctypes.POINTER(ctypes.c_int),  # out_i
        ctypes.POINTER(ctypes.c_int),  # out_j
        ctypes.POINTER(ctypes.c_double),  # out_shift
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _lib = _build()
                _tried = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def native_neighbor_list(
    positions: np.ndarray,
    r_max: float,
    cell: Optional[np.ndarray],
    pbc,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (centers, neighbors, shifts) or None if unavailable.

    NOTE: the native path wraps positions into the cell internally; the
    returned shifts are adjusted so ``r = pos[j] - pos[i] + shift @ cell``
    holds for the ORIGINAL (possibly unwrapped) positions.
    """
    lib = _get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, dtype=np.float64)
    n = len(pos)
    pbc_arr = np.ascontiguousarray(
        np.asarray(pbc, dtype=bool).astype(np.int32), dtype=np.int32
    )
    if cell is None:
        if pbc_arr.any():
            return None
        lo, hi = pos.min(0), pos.max(0)
        cell_arr = np.diag(np.maximum(hi - lo, 1.0) + 2 * r_max)
        pos = pos - lo + r_max
        wrap = None
    else:
        cell_arr = np.ascontiguousarray(np.asarray(cell, dtype=np.float64).reshape(3, 3))
        # per-atom integer wrap vectors to correct the output shifts
        frac = pos @ np.linalg.inv(cell_arr)
        wrap = np.zeros((n, 3), dtype=np.int64)
        wrap[:, pbc_arr.astype(bool)] = -np.floor(frac[:, pbc_arr.astype(bool)]).astype(np.int64)
        if not wrap.any():
            wrap = None
    cap = max(64 * n, 1024)
    for _ in range(4):
        out_i = np.empty(cap, dtype=np.int32)
        out_j = np.empty(cap, dtype=np.int32)
        out_s = np.empty((cap, 3), dtype=np.float64)
        ret = lib.atpu_neighbor_list(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            cell_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pbc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            float(r_max),
            cap,
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if ret >= 0:
            i, j, s = out_i[:ret], out_j[:ret], out_s[:ret]
            if wrap is not None:
                # pos_wrapped[a] = pos[a] + wrap[a] @ cell  →
                # shift' = shift + wrap[j] - wrap[i]
                s = s + (wrap[j] - wrap[i]).astype(np.float64)
            return i, j, s
        if ret == -1:
            return None
        cap = int(-ret) + 16
    return None
