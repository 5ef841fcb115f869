"""ctypes loader/builder for the native C++ cell-list neighborlist.

Compiles ``csrc/neighborlist.cpp`` with g++ on first use (cached as a shared
library next to the package).  Falls back silently to the scipy backend if
no compiler is available — callers use backend="auto".
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("nequip_tpu")

_LIB = None
_LIB_LOCK = threading.Lock()
_BUILD_FAILED = False


def _lib_path() -> str:
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(pkg_dir, "_lib", "libnequip_nl.so")


def _src_path() -> str:
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(pkg_dir, "csrc", "neighborlist.cpp")


def _build() -> Optional[str]:
    lib = _lib_path()
    src = _src_path()
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    os.makedirs(os.path.dirname(lib), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", src, "-o", lib]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return lib
    except Exception as e:  # pragma: no cover
        log.warning(f"native neighborlist build failed ({e}); using scipy backend")
        return None


def get_lib():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        path = _build()
        if path is None:
            _BUILD_FAILED = True
            return None
        lib = ctypes.CDLL(path)
        fn = lib.nequip_cell_list_nl
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # pos
            ctypes.c_int64,  # n_atoms
            ctypes.POINTER(ctypes.c_double),  # cell (nullable)
            ctypes.POINTER(ctypes.c_int32),  # pbc (nullable)
            ctypes.c_double,  # cutoff
            ctypes.c_int64,  # max_edges
            ctypes.POINTER(ctypes.c_int32),  # edge_dst
            ctypes.POINTER(ctypes.c_int32),  # edge_src
            ctypes.POINTER(ctypes.c_double),  # shifts
        ]
        _LIB = lib
        return _LIB


def cpp_cell_list_nl(
    pos: np.ndarray,
    r_max: float,
    cell: Optional[np.ndarray],
    pbc,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    assert lib is not None, "native neighborlist unavailable"
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    n = pos.shape[0]
    pbc_arr = np.ascontiguousarray(
        np.asarray(pbc, dtype=np.int32).reshape(-1)
    )
    if pbc_arr.size == 1:
        pbc_arr = np.repeat(pbc_arr, 3)
    cell_ptr = None
    if cell is not None and pbc_arr.any():
        cell_c = np.ascontiguousarray(np.asarray(cell, dtype=np.float64).reshape(9))
        cell_ptr = cell_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    # heuristic initial capacity; grows on demand
    cap = max(64 * n, 1024)
    for _ in range(4):
        dst = np.empty(cap, dtype=np.int32)
        src = np.empty(cap, dtype=np.int32)
        shifts = np.empty((cap, 3), dtype=np.float64)
        ret = lib.nequip_cell_list_nl(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
            cell_ptr,
            pbc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            float(r_max),
            cap,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            shifts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if ret >= 0:
            edge_index = np.stack([dst[:ret], src[:ret]])
            return edge_index, shifts[:ret]
        if ret == np.iinfo(np.int64).min:
            raise RuntimeError("native neighborlist failed (singular cell)")
        cap = int(-ret) + 1024
    raise RuntimeError("native neighborlist capacity negotiation failed")
