"""ctypes bindings for the native C++ components (native/libcfm_native.so).

The native library provides the Jonker–Volgenant dense linear-assignment
solver (native/lap.cc) — the framework's host-side exact-OT engine, replacing
the role of POT's C++ network simplex (`pot.emd`, used by the reference at
/root/reference/torchcfm/optimal_transport.py:49,87) and scipy's Hungarian
(:179). Auto-builds with `make -C native` on first use if g++ is available;
falls back to scipy otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcfm_native.so")

_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cfm_lap_solve.restype = ctypes.c_double
        lib.cfm_lap_solve.argtypes = [
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.cfm_lap_solve_batch.restype = None
        lib.cfm_lap_solve_batch.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def lap_solve(cost: np.ndarray) -> Tuple[np.ndarray, float]:
    """Exact assignment on a square cost matrix.

    Returns (rowsol, total_cost) with rowsol[i] = assigned column of row i.
    Uses the native JV solver when built, else scipy's Hungarian.
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n = cost.shape[0]
    assert cost.shape == (n, n), "lap_solve requires a square cost matrix"
    lib = _load()
    if lib is not None:
        rowsol = np.empty(n, np.int32)
        total = lib.cfm_lap_solve(
            n,
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            rowsol.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return rowsol, float(total)
    import scipy.optimize

    rows, cols = scipy.optimize.linear_sum_assignment(cost)
    return cols.astype(np.int32), float(cost[rows, cols].sum())


def lap_solve_batch(costs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Batched exact assignment: costs (b, n, n) -> (rowsols (b, n), totals (b,)).

    OpenMP-parallel across the batch in the native library.
    """
    costs = np.ascontiguousarray(costs, dtype=np.float64)
    b, n, n2 = costs.shape
    assert n == n2
    lib = _load()
    if lib is not None:
        rowsols = np.empty((b, n), np.int32)
        totals = np.empty(b, np.float64)
        lib.cfm_lap_solve_batch(
            b,
            n,
            costs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            rowsols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            totals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return rowsols, totals
    out_sols = np.empty((b, n), np.int32)
    out_tot = np.empty(b, np.float64)
    for k in range(b):
        out_sols[k], out_tot[k] = lap_solve(costs[k])
    return out_sols, out_tot
