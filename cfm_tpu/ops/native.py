"""ctypes bindings for the native C++ components (native/libcfm_native.so).

The native library provides the framework's host-side exact-OT engines,
replacing the role of POT's C++ network simplex (`pot.emd`, used by the
reference at /root/reference/torchcfm/optimal_transport.py:49,87) and
scipy's Hungarian (:179):

- Jonker–Volgenant dense linear assignment (native/lap.cc) for the
  square/uniform case, where the optimal plan is a permutation.
- Transportation-problem network simplex (native/emd.cc) for general
  marginals — rectangular cost matrices and weighted a/b, full `pot.emd`
  semantics.

Auto-builds with `make -C native` on first use if g++ is available; falls
back to scipy (Hungarian / HiGHS linprog) otherwise.
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
    # Rebuild when the .so is missing OR predates a source file (stale builds
    # from before a native component was added lack its symbols).
    sources = [
        os.path.join(_NATIVE_DIR, f)
        for f in os.listdir(_NATIVE_DIR)
        if f.endswith(".cc")
    ] if os.path.isdir(_NATIVE_DIR) else []
    stale = not os.path.exists(_LIB_PATH) or any(
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH) for src in sources
    )
    if stale and os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
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
        lib.cfm_emd_solve.restype = ctypes.c_double
        lib.cfm_emd_solve.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        _lib = lib
    except (OSError, AttributeError):
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


def emd_solve(
    a: np.ndarray, b: np.ndarray, cost: np.ndarray
) -> Tuple[np.ndarray, float]:
    """Exact OT plan for general marginals (``pot.emd(a, b, M)`` semantics).

    ``a`` (n,) and ``b`` (m,) are nonnegative marginal weights; ``cost`` is the
    (n, m) cost matrix. Totals are normalized to a common mass (POT asserts
    equality; we rescale ``b`` and warn-free match ``sum(a)``). Returns
    (plan (n, m), total_cost). Uses the native network simplex
    (native/emd.cc); falls back to scipy's HiGHS LP solver when the native
    library is unavailable.
    """
    a = np.ascontiguousarray(a, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    assert a.shape == (n,) and b.shape == (m,)
    sa, sb = a.sum(), b.sum()
    if sa <= 0 or sb <= 0:
        return np.zeros((n, m)), 0.0
    b = b * (sa / sb)
    lib = _load()
    if lib is not None:
        plan = np.zeros((n, m), np.float64)
        total = lib.cfm_emd_solve(
            n,
            m,
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            plan.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            0,
        )
        if total >= 0.0:
            return plan, float(total)
        # Pivot cap hit (pathological instance): fall through to the LP.
    import scipy.optimize
    import scipy.sparse as sp

    rows = sp.kron(sp.eye(n), np.ones((1, m)))
    cols = sp.kron(np.ones((1, n)), sp.eye(m))
    # Drop the final (redundant) equality to keep HiGHS happy.
    A_eq = sp.vstack([rows, cols]).tocsr()[:-1]
    b_eq = np.concatenate([a, b])[:-1]
    res = scipy.optimize.linprog(
        cost.ravel(), A_eq=A_eq, b_eq=b_eq, bounds=(0, None), method="highs"
    )
    if not res.success:
        raise RuntimeError(f"EMD LP failed: {res.message}")
    return res.x.reshape(n, m), float(res.fun)
