"""Generate committed OT oracle fixtures (tests/fixtures/ot_oracle.npz).

The reference pins its OT subsystem to POT's output exactly
(/root/reference/tests/test_optimal_transport.py:32-41). POT is not in this
image, so the fixtures are produced by INDEPENDENT solvers instead:

- Exact OT (``pot.emd`` role): scipy's HiGHS LP solver on the transportation
  linear program in float64 — a production simplex implementation that
  shares no code or algorithmic structure with either the framework's
  network simplex (native/emd.cc) or its on-device annealed Sinkhorn.
- Sinkhorn family (``pot.sinkhorn`` / ``sinkhorn_knopp_unbalanced`` /
  ``entropic_partial_wasserstein`` roles): direct scaling-form float64
  numpy iterations of the published algorithms (Cuturi 2013; Chizat et al.
  2018 KL-relaxed scaling; Benamou et al. 2015 Bregman projections), run to
  1e-12 convergence. These validate the framework's float32 log-domain
  ``lax.while_loop`` implementations against straight-line float64 math.

Run from the repo root:  python tools/gen_ot_fixtures.py
Deterministic (fixed seeds); the output is committed so tests never depend
on scipy's LP solver at test time.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.optimize
import scipy.sparse as sp

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "ot_oracle.npz")


def lp_emd(a: np.ndarray, b: np.ndarray, M: np.ndarray):
    """Exact OT via HiGHS on the transportation LP (float64)."""
    n, m = M.shape
    rows = sp.kron(sp.eye(n), np.ones((1, m)))
    cols = sp.kron(np.ones((1, n)), sp.eye(m))
    A_eq = sp.vstack([rows, cols]).tocsr()[:-1]  # last equality is redundant
    b_eq = np.concatenate([a, b])[:-1]
    res = scipy.optimize.linprog(
        M.ravel(), A_eq=A_eq, b_eq=b_eq, bounds=(0, None), method="highs"
    )
    assert res.success, res.message
    return res.x.reshape(n, m), res.fun


def np_sinkhorn(a, b, M, reg, iters=20000, tol=1e-14):
    """Balanced Sinkhorn, scaling form, float64 (Cuturi 2013)."""
    K = np.exp(-M / reg)
    u = np.ones_like(a)
    for _ in range(iters):
        u_new = a / (K @ (b / (K.T @ u)))
        if np.max(np.abs(u_new - u)) < tol:
            u = u_new
            break
        u = u_new
    v = b / (K.T @ u)
    return u[:, None] * K * v[None, :]


def np_sinkhorn_unbalanced(a, b, M, reg, reg_m1, reg_m2, iters=20000, tol=1e-14):
    """KL-relaxed unbalanced Sinkhorn, scaling form, float64 (Chizat 2018).

    Two marginal relaxation strengths, covering the runner's modified
    solver (reference runner/src/models/components/sinkhorn_knopp_unbalanced.py).
    """
    K = np.exp(-M / reg)
    fi1 = reg_m1 / (reg_m1 + reg) if np.isfinite(reg_m1) else 1.0
    fi2 = reg_m2 / (reg_m2 + reg) if np.isfinite(reg_m2) else 1.0
    u = np.full(a.shape, 1.0 / len(a))
    v = np.full(b.shape, 1.0 / len(b))
    for _ in range(iters):
        u_new = (a / (K @ v)) ** fi1
        v_new = (b / (K.T @ u_new)) ** fi2
        if np.max(np.abs(u_new - u)) < tol:
            u, v = u_new, v_new
            break
        u, v = u_new, v_new
    return u[:, None] * K * v[None, :]


def np_partial(a, b, M, reg, mass, iters=20000, tol=1e-15):
    """Entropic partial OT via iterated Bregman projections, float64
    (Benamou et al. 2015: project onto {rows<=a}, {cols<=b}, {sum=mass})."""
    K = np.exp(-M / reg)
    K = K * (mass / K.sum())
    for _ in range(iters):
        K_prev = K
        K = np.minimum(a / np.maximum(K.sum(1), 1e-300), 1.0)[:, None] * K
        K = K * np.minimum(b / np.maximum(K.sum(0), 1e-300), 1.0)[None, :]
        K = K * (mass / K.sum())
        if np.max(np.abs(K - K_prev)) < tol:
            break
    return K


def main() -> None:
    rng = np.random.default_rng(20260817)
    out = {}

    # --- Exact OT cases: square/uniform, rectangular/uniform, weighted.
    exact_cases = [
        ("sq_uniform", 32, 32, False),
        ("rect_uniform", 24, 40, False),
        ("rect_uniform2", 48, 20, False),
        ("sq_weighted", 32, 32, True),
        ("rect_weighted", 40, 24, True),
    ]
    for name, n, m, weighted in exact_cases:
        x0 = rng.normal(size=(n, 3))
        x1 = rng.normal(size=(m, 3)) + 0.5
        M = ((x0[:, None, :] - x1[None, :, :]) ** 2).sum(-1)
        if weighted:
            a = rng.dirichlet(np.ones(n))
            b = rng.dirichlet(np.ones(m))
        else:
            a = np.full(n, 1.0 / n)
            b = np.full(m, 1.0 / m)
        plan, cost = lp_emd(a, b, M)
        out[f"exact_{name}_x0"] = x0
        out[f"exact_{name}_x1"] = x1
        out[f"exact_{name}_a"] = a
        out[f"exact_{name}_b"] = b
        out[f"exact_{name}_plan"] = plan
        out[f"exact_{name}_cost"] = np.asarray(cost)

    # --- Sinkhorn balanced: two reg values, rectangular.
    x0 = rng.normal(size=(32, 3))
    x1 = rng.normal(size=(48, 3))
    M = ((x0[:, None, :] - x1[None, :, :]) ** 2).sum(-1)
    a = np.full(32, 1 / 32.0)
    b = np.full(48, 1 / 48.0)
    out["sink_x0"], out["sink_x1"] = x0, x1
    for reg in (0.05, 0.5):
        out[f"sink_plan_reg{reg}"] = np_sinkhorn(a, b, M, reg)

    # --- Unbalanced: scalar and per-marginal reg_m (square).
    x0u = rng.normal(size=(24, 3))
    x1u = rng.normal(size=(24, 3)) + 1.0
    Mu = ((x0u[:, None, :] - x1u[None, :, :]) ** 2).sum(-1)
    au = np.full(24, 1 / 24.0)
    bu = np.full(24, 1 / 24.0)
    out["unb_x0"], out["unb_x1"] = x0u, x1u
    out["unb_plan_regm1"] = np_sinkhorn_unbalanced(au, bu, Mu, 0.1, 1.0, 1.0)
    out["unb_plan_regm_pair"] = np_sinkhorn_unbalanced(au, bu, Mu, 0.1, 1.0, 10.0)

    # --- Partial: mass 0.5.
    out["part_plan_mass0.5"] = np_partial(au, bu, Mu, 0.1, 0.5)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} arrays")


if __name__ == "__main__":
    main()
