"""OT coupling tests — parity with /root/reference/tests/test_optimal_transport.py.

- sample_map inverts a permutation plan exactly (replace=False)  (ref :15-29)
- get_map equals an independent exact solve                       (ref :32-41)
- sample_plan = get_map + sample_map composition under one key    (ref :44-60)
- auction solver matches the native/scipy Hungarian oracle
- sinkhorn plan marginals are correct; unbalanced/partial plans finite
- trajectory chaining shapes
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu.coupling import OTPlanSampler
from cfm_tpu.ops.assignment import (
    assignment_cost,
    auction_assignment,
    hungarian_assignment,
)
from cfm_tpu.ops.cost import sq_euclidean_cost
from cfm_tpu.ops.sinkhorn import partial_wasserstein, sinkhorn, sinkhorn_unbalanced


def test_sample_map_inverts_permutation():
    n = 16
    perm = jax.random.permutation(jax.random.PRNGKey(0), n)
    pi = jnp.zeros((n, n)).at[jnp.arange(n), perm].set(1.0 / n)
    i, j = OTPlanSampler.sample_map(jax.random.PRNGKey(1), pi, n, replace=False)
    # Without replacement over a permutation plan, every row appears once and
    # maps to its permuted column.
    assert sorted(np.asarray(i).tolist()) == list(range(n))
    np.testing.assert_array_equal(np.asarray(perm)[np.asarray(i)], np.asarray(j))


def test_get_map_equals_direct_assignment():
    key0, key1 = jax.random.split(jax.random.PRNGKey(2))
    x0 = jax.random.normal(key0, (32, 3))
    x1 = jax.random.normal(key1, (32, 3))
    sampler = OTPlanSampler(method="exact")
    pi = sampler.get_map(x0, x1)
    M = sq_euclidean_cost(x0, x1)
    perm = auction_assignment(M)
    expected = np.zeros((32, 32), np.float32)
    expected[np.arange(32), np.asarray(perm)] = 1.0 / 32
    np.testing.assert_allclose(np.asarray(pi), expected)


def test_auction_matches_hungarian_cost():
    for seed in range(3):
        M = jax.random.uniform(jax.random.PRNGKey(seed), (64, 64))
        pa = auction_assignment(M)
        ph = hungarian_assignment(M)
        ca = float(assignment_cost(M, pa))
        ch = float(assignment_cost(M, ph))
        assert abs(ca - ch) / max(ch, 1e-9) < 1e-4, (seed, ca, ch)
        # Result is a permutation.
        assert sorted(np.asarray(pa).tolist()) == list(range(64))


def test_sample_plan_composition():
    key = jax.random.PRNGKey(3)
    k0, k1, kp = jax.random.split(key, 3)
    x0 = jax.random.normal(k0, (24, 2))
    x1 = jax.random.normal(k1, (24, 2))
    sampler = OTPlanSampler(method="exact")
    rx0, rx1 = sampler.sample_plan(kp, x0, x1)
    pi = sampler.get_map(x0, x1)
    i, j = sampler.sample_map(kp, pi, 24)
    np.testing.assert_array_equal(np.asarray(rx0), np.asarray(x0[i]))
    np.testing.assert_array_equal(np.asarray(rx1), np.asarray(x1[j]))


def test_exact_coupling_reduces_transport_cost():
    """OT pairing must shorten mean pair distance vs independent pairing."""
    k0, k1, kp = jax.random.split(jax.random.PRNGKey(4), 3)
    x0 = jax.random.normal(k0, (128, 2))
    x1 = jax.random.normal(k1, (128, 2)) + 3.0
    sampler = OTPlanSampler(method="exact")
    rx0, rx1 = sampler.sample_plan(kp, x0, x1)
    d_ot = float(jnp.mean(jnp.sum(jnp.square(rx0 - rx1), axis=1)))
    d_ind = float(jnp.mean(jnp.sum(jnp.square(x0 - x1), axis=1)))
    assert d_ot < d_ind


def test_sinkhorn_marginals():
    M = jax.random.uniform(jax.random.PRNGKey(5), (32, 48))
    a = jnp.full((32,), 1 / 32)
    b = jnp.full((48,), 1 / 48)
    pi = sinkhorn(a, b, M, reg=0.1)
    np.testing.assert_allclose(np.asarray(pi.sum(1)), np.asarray(a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pi.sum(0)), np.asarray(b), atol=1e-6)


def test_sinkhorn_small_reg_approaches_exact():
    k0, k1 = jax.random.split(jax.random.PRNGKey(6))
    x0 = jax.random.normal(k0, (32, 2))
    x1 = jax.random.normal(k1, (32, 2))
    M = sq_euclidean_cost(x0, x1)
    a = b = jnp.full((32,), 1 / 32)
    pi = sinkhorn(a, b, M, reg=0.005, num_iters=5000)
    cost_sink = float(jnp.sum(pi * M))
    perm = auction_assignment(M)
    cost_exact = float(assignment_cost(M, perm)) / 32
    assert cost_sink >= cost_exact - 1e-5
    assert cost_sink < cost_exact * 1.2 + 1e-3


def _fixtures():
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "ot_oracle.npz")
    return np.load(path)


def test_sinkhorn_matches_float64_oracle():
    """Log-domain f32 while_loop Sinkhorn == committed float64 scaling-form
    oracle plans (tools/gen_ot_fixtures.py), the reference's POT-pinning test
    pattern (/root/reference/tests/test_optimal_transport.py:32-41)."""
    fx = _fixtures()
    M = sq_euclidean_cost(jnp.asarray(fx["sink_x0"]), jnp.asarray(fx["sink_x1"]))
    a = jnp.full((32,), 1 / 32.0)
    b = jnp.full((48,), 1 / 48.0)
    for reg in (0.05, 0.5):
        pi = sinkhorn(a, b, M, reg=reg, num_iters=5000, tol=0.0)
        np.testing.assert_allclose(
            np.asarray(pi), fx[f"sink_plan_reg{reg}"], atol=1e-4
        )


def test_unbalanced_matches_float64_oracle():
    fx = _fixtures()
    M = sq_euclidean_cost(jnp.asarray(fx["unb_x0"]), jnp.asarray(fx["unb_x1"]))
    a = b = jnp.full((24,), 1 / 24.0)
    pi = sinkhorn_unbalanced(a, b, M, reg=0.1, reg_m=1.0, num_iters=5000, tol=0.0)
    np.testing.assert_allclose(np.asarray(pi), fx["unb_plan_regm1"], atol=1e-4)
    pi = sinkhorn_unbalanced(
        a, b, M, reg=0.1, reg_m=(1.0, 10.0), num_iters=5000, tol=0.0
    )
    np.testing.assert_allclose(np.asarray(pi), fx["unb_plan_regm_pair"], atol=1e-4)


def test_partial_matches_float64_oracle():
    fx = _fixtures()
    M = sq_euclidean_cost(jnp.asarray(fx["unb_x0"]), jnp.asarray(fx["unb_x1"]))
    a = b = jnp.full((24,), 1 / 24.0)
    pi = partial_wasserstein(a, b, M, reg=0.1, mass=0.5, num_iters=5000)
    np.testing.assert_allclose(np.asarray(pi), fx["part_plan_mass0.5"], atol=1e-4)
    np.testing.assert_allclose(float(pi.sum()), 0.5, atol=1e-4)
    assert bool(jnp.all(pi.sum(1) <= np.asarray(a) + 1e-6))


def test_sample_plan_exact_order_preserves_x0():
    k0, k1 = jax.random.split(jax.random.PRNGKey(8))
    x0 = jax.random.normal(k0, (16, 2))
    x1 = jax.random.normal(k1, (16, 2))
    sampler = OTPlanSampler(method="exact")
    rx0, rx1 = sampler.sample_plan_exact_order(x0, x1)
    np.testing.assert_array_equal(np.asarray(rx0), np.asarray(x0))
    # rx1 is a permutation of x1.
    assert sorted(map(tuple, np.asarray(rx1).round(5).tolist())) == sorted(
        map(tuple, np.asarray(x1).round(5).tolist())
    )


def test_sample_trajectory_shapes():
    X = jax.random.normal(jax.random.PRNGKey(9), (32, 4, 3))
    sampler = OTPlanSampler(method="exact")
    traj = sampler.sample_trajectory(jax.random.PRNGKey(10), X)
    assert traj.shape == (32, 4, 3)
    np.testing.assert_array_equal(np.asarray(traj[:, 0]), np.asarray(X[:, 0]))


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        OTPlanSampler(method="nope")


def test_exact_general_marginals_vs_lp_oracle():
    """get_map with unequal batch sizes / weighted marginals == the committed
    HiGHS LP plans (pot.emd semantics, reference optimal_transport.py:87).
    Concrete inputs run the native network simplex host path."""
    fx = _fixtures()
    sampler = OTPlanSampler(method="exact")
    for name in ("sq_uniform", "rect_uniform", "rect_uniform2"):
        x0 = jnp.asarray(fx[f"exact_{name}_x0"], jnp.float32)
        x1 = jnp.asarray(fx[f"exact_{name}_x1"], jnp.float32)
        pi = np.asarray(sampler.get_map(x0, x1))
        # Cost must match the LP optimum; the plan itself matches wherever the
        # optimum is unique (generic random instances).
        M = np.asarray(sq_euclidean_cost(x0, x1), np.float64)
        np.testing.assert_allclose(
            (pi * M).sum(), fx[f"exact_{name}_cost"], rtol=2e-5
        )
        np.testing.assert_allclose(pi.sum(1), fx[f"exact_{name}_a"], atol=1e-6)
        np.testing.assert_allclose(pi.sum(0), fx[f"exact_{name}_b"], atol=1e-6)
        np.testing.assert_allclose(pi, fx[f"exact_{name}_plan"], atol=1e-5)
    for name in ("sq_weighted", "rect_weighted"):
        x0 = jnp.asarray(fx[f"exact_{name}_x0"], jnp.float32)
        x1 = jnp.asarray(fx[f"exact_{name}_x1"], jnp.float32)
        a = jnp.asarray(fx[f"exact_{name}_a"], jnp.float32)
        b = jnp.asarray(fx[f"exact_{name}_b"], jnp.float32)
        pi = np.asarray(sampler.get_map(x0, x1, a=a, b=b))
        M = np.asarray(sq_euclidean_cost(x0, x1), np.float64)
        np.testing.assert_allclose(
            (pi * M).sum(), fx[f"exact_{name}_cost"], rtol=2e-5
        )
        np.testing.assert_allclose(pi, fx[f"exact_{name}_plan"], atol=1e-5)


def test_exact_general_marginals_on_device_jit():
    """Under jit (traced inputs) the general-marginal exact path runs the
    ε-annealed Sinkhorn + feasibility rounding on device: marginals exact,
    cost within 0.5% of the LP optimum."""
    fx = _fixtures()
    sampler = OTPlanSampler(method="exact")
    for name in ("rect_uniform", "rect_weighted"):
        x0 = jnp.asarray(fx[f"exact_{name}_x0"], jnp.float32)
        x1 = jnp.asarray(fx[f"exact_{name}_x1"], jnp.float32)
        a = jnp.asarray(fx[f"exact_{name}_a"], jnp.float32)
        b = jnp.asarray(fx[f"exact_{name}_b"], jnp.float32)
        pi = np.asarray(jax.jit(sampler.get_map)(x0, x1, a, b))
        M = np.asarray(sq_euclidean_cost(x0, x1), np.float64)
        cost_opt = float(fx[f"exact_{name}_cost"])
        assert (pi * M).sum() <= cost_opt * 1.005 + 1e-7, name
        np.testing.assert_allclose(pi.sum(1), np.asarray(a), atol=2e-6)
        np.testing.assert_allclose(pi.sum(0), np.asarray(b), atol=2e-6)


def test_wasserstein_unequal_clouds():
    """wasserstein() on unequal batch sizes == sqrt(LP optimal cost)."""
    from cfm_tpu.coupling import wasserstein

    fx = _fixtures()
    x0 = jnp.asarray(fx["exact_rect_uniform_x0"], jnp.float32)
    x1 = jnp.asarray(fx["exact_rect_uniform_x1"], jnp.float32)
    w2 = float(wasserstein(x0, x1, method="exact", power=2))
    np.testing.assert_allclose(
        w2, np.sqrt(float(fx["exact_rect_uniform_cost"])), rtol=2e-5
    )


def test_sample_trajectory_unequal_not_needed_but_plan_general():
    """sample_plan works end to end on an unequal pair (n != m)."""
    k0, k1, kp = jax.random.split(jax.random.PRNGKey(12), 3)
    x0 = jax.random.normal(k0, (20, 2))
    x1 = jax.random.normal(k1, (30, 2))
    sampler = OTPlanSampler(method="exact")
    rx0, rx1 = sampler.sample_plan(kp, x0, x1)
    assert rx0.shape == (20, 2) and rx1.shape == (20, 2)


def test_coupling_under_jit():
    sampler = OTPlanSampler(method="exact")

    @jax.jit
    def couple(key, x0, x1):
        return sampler.sample_plan(key, x0, x1)

    k0, k1, kp = jax.random.split(jax.random.PRNGKey(11), 3)
    rx0, rx1 = couple(kp, jax.random.normal(k0, (32, 2)), jax.random.normal(k1, (32, 2)))
    assert rx0.shape == (32, 2) and rx1.shape == (32, 2)


def test_native_lap_matches_scipy():
    from cfm_tpu.ops.native import lap_solve, lap_solve_batch, native_available

    rng = np.random.default_rng(0)
    C = rng.random((48, 48))
    sol, total = lap_solve(C)
    import scipy.optimize

    r, c = scipy.optimize.linear_sum_assignment(C)
    np.testing.assert_allclose(total, C[r, c].sum(), rtol=1e-12)
    assert sorted(sol.tolist()) == list(range(48))
    sols, totals = lap_solve_batch(rng.random((4, 24, 24)))
    assert sols.shape == (4, 24) and totals.shape == (4,)


def test_onehot_auction_matches_lap():
    """The scatter-free auction round (shared by the Pallas kernel and its
    XLA oracle, ops/pallas_auction.py) solves exactly."""
    from cfm_tpu.ops.native import lap_solve
    from cfm_tpu.ops.pallas_auction import auction_assignment_onehot_xla

    for seed, shift in [(0, 1.0), (1, 3.0), (2, 0.0)]:
        k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
        x0 = jax.random.normal(k0, (96, 3))
        x1 = jax.random.normal(k1, (96, 3)) + shift
        M = sq_euclidean_cost(x0, x1)
        p = np.asarray(auction_assignment_onehot_xla(M))
        assert sorted(p.tolist()) == list(range(96))
        _, copt = lap_solve(np.asarray(M))
        ca = float(np.asarray(M)[np.arange(96), p].sum())
        assert abs(ca - copt) / max(copt, 1e-9) < 1e-4


def test_sanitize_perm_detects_unowned_rows():
    """Round-cap bailouts leave unowned rows; the kernels now emit the n
    sentinel for them (min-reduction, NOT sum/argmax which read an all-zero
    one-hot row as the valid-looking index 0 — ADVICE r3). _sanitize_perm
    must complete any such partial matching into a valid permutation."""
    from cfm_tpu.ops.pallas_auction import _sanitize_perm

    n = 8
    # Rows 1 and 4 unowned (sentinel n); row 6 also maps to column 0 — the
    # old sum-extraction shape of the bug: duplicates of 0 would survive.
    partial = jnp.array([2, n, 0, 5, n, 3, 0, 7], jnp.int32)
    fixed = np.asarray(_sanitize_perm(partial, n))
    assert sorted(fixed.tolist()) == list(range(n))
    # Owned assignments that were unique are preserved.
    for i, v in [(0, 2), (3, 5), (5, 3), (7, 7)]:
        assert fixed[i] == v
    # A complete permutation passes through untouched.
    ident = jnp.arange(n, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(_sanitize_perm(ident, n)), np.asarray(ident))


def test_sharded_sinkhorn_matches_single_device():
    """Row-sharded distributed Sinkhorn == single-device solver on the
    8-device CPU mesh (the batch x batch cost-matrix scaling axis,
    SURVEY.md section 5)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from cfm_tpu.ops.sharded_sinkhorn import sharded_sinkhorn_plan
    from cfm_tpu.parallel import make_mesh

    mesh = make_mesh()
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    x0 = jax.random.normal(k0, (128, 4))
    x1 = jax.random.normal(k1, (96, 4))
    plan_sharded = np.asarray(sharded_sinkhorn_plan(mesh, x0, x1, reg=0.1, num_iters=200))
    a = jnp.full((128,), 1 / 128.0)
    b = jnp.full((96,), 1 / 96.0)
    plan_ref = np.asarray(
        sinkhorn(a, b, sq_euclidean_cost(x0, x1), 0.1, num_iters=200, tol=0.0)
    )
    np.testing.assert_allclose(plan_sharded, plan_ref, atol=1e-6)
    np.testing.assert_allclose(plan_sharded.sum(0), np.asarray(b), atol=1e-6)


def test_pallas_auction_on_tpu():
    """Exactness of the in-VMEM Pallas auction kernel (TPU only; the CPU CI
    covers the identical round math via auction_assignment_onehot_xla)."""
    if jax.default_backend() == "cpu":
        pytest.skip("pallas auction kernel needs a TPU backend")
    from cfm_tpu.ops.native import lap_solve
    from cfm_tpu.ops.pallas_auction import pallas_auction_assignment

    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    x0 = jax.random.normal(k0, (128, 3))
    x1 = jax.random.normal(k1, (128, 3)) + 2.0
    M = sq_euclidean_cost(x0, x1)
    p = np.asarray(pallas_auction_assignment(M))
    assert sorted(p.tolist()) == list(range(128))
    _, copt = lap_solve(np.asarray(M))
    ca = float(np.asarray(M)[np.arange(128), p].sum())
    assert abs(ca - copt) / copt < 1e-5


@pytest.mark.parametrize("n", [1024, 2048, 4096])
def test_pallas_auction_tiled_on_tpu(n):
    """Tiled auction (compact state; HBM-streamed benefit at n=2048) is
    near-optimal vs the native JV solver and a valid permutation — the
    round-1 n<=512 VMEM cutoff lifted (VERDICT item 7)."""
    if jax.default_backend() == "cpu":
        pytest.skip("pallas auction kernel needs a TPU backend")
    from cfm_tpu.ops.native import lap_solve
    from cfm_tpu.ops.pallas_auction import pallas_auction_assignment_tiled

    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    x0 = jax.random.normal(k0, (n, 4))
    x1 = jax.random.normal(k1, (n, 4)) + 1.5
    M = sq_euclidean_cost(x0, x1)
    p = np.asarray(pallas_auction_assignment_tiled(M))
    assert sorted(p.tolist()) == list(range(n))
    _, copt = lap_solve(np.asarray(M))
    ca = float(np.asarray(M)[np.arange(n), p].sum())
    assert abs(ca - copt) / copt < 1e-3, (ca, copt)


# ---------------------------------------------------------------------------
# Flash Sinkhorn (ops/flash_sinkhorn.py): IO-aware entropic OT from points
# ---------------------------------------------------------------------------


def test_flash_sinkhorn_xla_matches_materialized():
    """The points-based solver (XLA path) reproduces ops/sinkhorn.sinkhorn on
    the materialized squared-Euclidean cost."""
    from cfm_tpu.ops.flash_sinkhorn import sinkhorn_from_points
    from cfm_tpu.ops.sinkhorn import sinkhorn

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (48, 3))
    y = jax.random.normal(jax.random.fold_in(key, 1), (40, 3)) + 1.0
    f, g = sinkhorn_from_points(x, y, reg=0.5)
    M = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, -1)
    a = jnp.full((48,), 1 / 48)
    b = jnp.full((40,), 1 / 40)
    plan_ref = sinkhorn(a, b, M, reg=0.5)
    plan = jnp.exp((f[:, None] + g[None, :] - M) / 0.5)
    np.testing.assert_allclose(np.asarray(plan), np.asarray(plan_ref),
                               rtol=1e-4, atol=1e-7)


def test_flash_sinkhorn_kernel_interpret_matches_xla():
    """Interpret-mode run of the Pallas kernel pins the tiled online-LSE
    math itself (tile_j/tile_i split sizes exercised by non-equal n, m)."""
    from cfm_tpu.ops import flash_sinkhorn as fs

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (64, 4))
    y = jax.random.normal(jax.random.fold_in(key, 3), (48, 4)) + 0.5
    f_x, g_x = fs._flash_sinkhorn_xla(
        x, y, jnp.log(jnp.full((64,), 1 / 64)), jnp.log(jnp.full((48,), 1 / 48)),
        0.3, 1000, 1e-6)
    old = fs.INTERPRET
    fs.INTERPRET = True
    try:
        f_p, g_p = fs.sinkhorn_from_points(x, y, reg=0.3)
    finally:
        fs.INTERPRET = old
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5)


def test_flash_plan_sample_and_cost():
    """Chunked consumers: Gumbel-max sampling recovers the (near-)
    permutation coupling of well-separated clouds at small reg, and the
    chunked transport cost equals sinkhorn2 on the dense plan."""
    from cfm_tpu.ops.flash_sinkhorn import (
        plan_sample_from_potentials,
        sinkhorn_from_points,
        transport_cost_from_potentials,
    )
    from cfm_tpu.ops.sinkhorn import sinkhorn2

    key = jax.random.PRNGKey(4)
    n = 32
    x = jax.random.normal(key, (n, 2)) * 0.01
    x = x + jnp.arange(n)[:, None] * 1.0           # well-separated line
    perm = jax.random.permutation(jax.random.fold_in(key, 5), n)
    y = x[perm] + 0.1
    f, g = sinkhorn_from_points(x, y, reg=0.05, num_iters=2000)

    idx = plan_sample_from_potentials(jax.random.fold_in(key, 6), x, y, f, g,
                                      reg=0.05, chunk=16)
    # pi concentrates on the permutation: sampled j must invert perm.
    np.testing.assert_array_equal(np.asarray(perm[idx]), np.arange(n))

    cost = transport_cost_from_potentials(x, y, f, g, reg=0.05, chunk=16)
    M = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, -1)
    ref = sinkhorn2(jnp.full((n,), 1 / n), jnp.full((n,), 1 / n), M, reg=0.05,
                    num_iters=2000)
    np.testing.assert_allclose(float(cost), float(ref), rtol=1e-3)


def test_flash_sinkhorn_on_tpu():
    """Hardware run of the flash kernel vs the materialized-cost twin."""
    if jax.default_backend() == "cpu":
        pytest.skip("flash sinkhorn kernel needs a TPU backend")
    from cfm_tpu.ops.flash_sinkhorn import (
        _center, _flash_sinkhorn_xla, sinkhorn_from_points,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (512, 8))
    y = jax.random.normal(jax.random.fold_in(key, 1), (512, 8)) + 1.0
    f, g = sinkhorn_from_points(x, y, reg=0.5)
    xc, yc = _center(x, y)
    la = jnp.log(jnp.full((512,), 1 / 512))
    fx, gx = _flash_sinkhorn_xla(xc, yc, la, la, 0.5, 1000, 1e-6)
    np.testing.assert_allclose(np.asarray(f), np.asarray(fx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gx), atol=1e-4)


def test_sample_plan_flash_path_pairs_clusters():
    """flash=True sample_plan: with two well-separated cluster pairs and a
    small reg, every x0 must be paired with an x1 from ITS cluster — same
    behaviour as the dense-plan path, no (n, m) plan materialized."""
    from cfm_tpu.coupling import OTPlanSampler

    key = jax.random.PRNGKey(0)
    n = 64
    c = jnp.array([0.0, 0.0])
    far = jnp.array([30.0, 0.0])
    half = n // 2
    x0 = jnp.concatenate([
        jax.random.normal(key, (half, 2)) * 0.1 + c,
        jax.random.normal(jax.random.fold_in(key, 1), (half, 2)) * 0.1 + far,
    ])
    x1 = jnp.concatenate([
        jax.random.normal(jax.random.fold_in(key, 2), (half, 2)) * 0.1 + c,
        jax.random.normal(jax.random.fold_in(key, 3), (half, 2)) * 0.1 + far,
    ])
    s = OTPlanSampler(method="sinkhorn", reg=0.5, flash=True)
    a, b = s.sample_plan(jax.random.fold_in(key, 4), x0, x1)
    assert a.shape == x0.shape and b.shape == x1.shape
    # Stratified rows: a IS x0 in order; every pair stays within-cluster.
    np.testing.assert_array_equal(np.asarray(a), np.asarray(x0))
    d = jnp.sum((a - b) ** 2, axis=1)
    assert float(jnp.max(d)) < 10.0, float(jnp.max(d))

    # flash=False keeps the dense-plan path (equal coupled quality).
    s2 = OTPlanSampler(method="sinkhorn", reg=0.5, flash=False)
    a2, b2 = s2.sample_plan(jax.random.fold_in(key, 5), x0, x1)
    d2 = jnp.sum((a2 - b2) ** 2, axis=1)
    assert float(jnp.max(d2)) < 10.0


def test_wasserstein_flash_path_matches_materialized():
    """The large-n sinkhorn W2 flash route equals the materialized route
    (threshold forced low by monkeypatching is avoided — instead compare the
    two implementations directly at small n)."""
    from cfm_tpu.coupling import wasserstein
    from cfm_tpu.ops.flash_sinkhorn import (
        sinkhorn_from_points,
        transport_cost_from_potentials,
    )

    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (96, 4))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (96, 4)) + 1.0
    ref = float(wasserstein(x0, x1, method="sinkhorn", reg=0.2))
    f, g = sinkhorn_from_points(x0, x1, 0.2)
    got = float(jnp.sqrt(transport_cost_from_potentials(x0, x1, f, g, 0.2)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_flash_sinkhorn_nonuniform_marginals():
    """sinkhorn_from_points with weighted marginals equals ops/sinkhorn on
    the materialized cost with the same (a, b)."""
    from cfm_tpu.ops.flash_sinkhorn import sinkhorn_from_points
    from cfm_tpu.ops.sinkhorn import sinkhorn

    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (40, 3))
    y = jax.random.normal(jax.random.fold_in(key, 1), (56, 3)) + 0.5
    a = jax.random.uniform(jax.random.fold_in(key, 2), (40,)) + 0.1
    a = a / jnp.sum(a)
    b = jax.random.uniform(jax.random.fold_in(key, 3), (56,)) + 0.1
    b = b / jnp.sum(b)
    f, g = sinkhorn_from_points(x, y, reg=0.4, a=a, b=b)
    M = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, -1)
    plan_ref = sinkhorn(a, b, M, reg=0.4)
    plan = jnp.exp((f[:, None] + g[None, :] - M) / 0.4)
    np.testing.assert_allclose(np.asarray(plan), np.asarray(plan_ref),
                               rtol=2e-4, atol=1e-7)
    # marginals honored
    np.testing.assert_allclose(np.asarray(plan.sum(1)), np.asarray(a), atol=1e-4)


def test_row_marginal_error_certificate():
    """Converged potentials certify (tiny row-marginal error); finite-but-
    wrong potentials (the underflow failure mode the sample_plan guard must
    catch) produce a large error — isfinite alone cannot distinguish them."""
    from cfm_tpu.ops.flash_sinkhorn import (
        row_marginal_error_from_potentials,
        sinkhorn_from_points,
    )

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (64, 2))
    y = jax.random.normal(jax.random.fold_in(key, 1), (64, 2)) + 1.0
    f, g = sinkhorn_from_points(x, y, reg=0.5)
    err = float(row_marginal_error_from_potentials(x, y, f, g, 0.5))
    assert err < 1e-3, err

    # Finite but massively under-scaled potentials: every row's plan mass
    # collapses toward zero -> relative marginal error ~1.
    bad = float(row_marginal_error_from_potentials(x, y, f - 50.0, g, 0.5))
    assert np.isfinite(bad) and bad > 0.9, bad


def test_sample_plan_flash_unconverged_falls_back_uniform(monkeypatch):
    """A finite-but-unconverged flash solve must trigger the uniform-pair
    fallback (same behavior as get_map's degenerate-plan guard) instead of
    feeding near-arbitrary argmax pairings downstream."""
    from cfm_tpu import coupling as cp
    from cfm_tpu.ops import flash_sinkhorn as fs

    key = jax.random.PRNGKey(4)
    n = 64
    x0 = jax.random.normal(key, (n, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (n, 2)) + 20.0

    # Two well-separated cluster pairs: a working flash path pairs strictly
    # within-cluster (see test_sample_plan_flash_path_pairs_clusters); the
    # uniform fallback pairs ~half the rows across clusters.
    half = n // 2
    far = jnp.array([30.0, 0.0])
    x0 = jnp.concatenate([x0[:half] * 0.1, x0[half:] * 0.1 + far])
    x1 = jnp.concatenate([x1[:half] * 0.0 + jax.random.normal(
        jax.random.fold_in(key, 5), (half, 2)) * 0.1,
        jax.random.normal(jax.random.fold_in(key, 6), (half, 2)) * 0.1 + far])

    real_solve = fs.sinkhorn_from_points

    def broken_solve(x, y, reg, **kw):
        f, g = real_solve(x, y, reg, **kw)
        return f - 50.0, g  # finite, wrong scale -> rows underflow

    monkeypatch.setattr(
        "cfm_tpu.ops.flash_sinkhorn.sinkhorn_from_points", broken_solve
    )
    s = cp.OTPlanSampler(method="sinkhorn", reg=0.5, flash=True)
    a, b = s.sample_plan(jax.random.fold_in(key, 2), x0, x1)
    d = np.asarray(jnp.sum((a - b) ** 2, axis=1))
    cross = float((d > 100.0).mean())
    assert cross > 0.2, f"guard did not fire: cross-cluster frac {cross}"


def test_cost_centering_far_from_origin():
    """sq_euclidean_cost must center before the dot-form expansion: clouds at
    offset 1e3 in f32 would otherwise lose the O(d) distances to cancellation
    against the O(|mu|^2 d) norms (the reference's torch.cdist never sees
    this because it differences first)."""
    import numpy as np

    rng = np.random.RandomState(0)
    x0 = rng.randn(64, 8).astype(np.float32)
    x1 = rng.randn(64, 8).astype(np.float32)
    from cfm_tpu.ops.cost import sq_euclidean_cost

    base = np.asarray(sq_euclidean_cost(jnp.asarray(x0), jnp.asarray(x1)))
    off = np.float32(1000.0)
    shifted = np.asarray(
        sq_euclidean_cost(jnp.asarray(x0 + off), jnp.asarray(x1 + off))
    )
    np.testing.assert_allclose(shifted, base, rtol=1e-3, atol=1e-3)


def test_emd_annealed_rescales_unequal_masses():
    """Traced-path exact OT must match the host path's mass handling: b is
    rescaled to sum(a), so the returned plan satisfies BOTH marginals."""
    import numpy as np

    from cfm_tpu.ops.sinkhorn import emd_annealed

    rng = np.random.RandomState(1)
    M = jnp.asarray(np.abs(rng.randn(24, 16)).astype(np.float32))
    a = jnp.asarray(rng.rand(24).astype(np.float32))  # sum != 1
    b = jnp.asarray(3.0 * rng.rand(16).astype(np.float32))  # 3x the mass scale
    plan = emd_annealed(a, b, M)
    np.testing.assert_allclose(np.asarray(plan.sum(axis=1)), np.asarray(a),
                               atol=2e-4)
    b_scaled = np.asarray(b) * float(a.sum() / b.sum())
    np.testing.assert_allclose(np.asarray(plan.sum(axis=0)), b_scaled,
                               atol=2e-4)


def test_auction_round_cap_returns_valid_permutation():
    """An auction solve cut off by max_rounds must still return a valid
    permutation (the -1 sentinels would silently WRAP in downstream gathers)."""
    import numpy as np

    from cfm_tpu.ops.assignment import auction_assignment

    M = jnp.asarray(np.abs(np.random.RandomState(2).randn(32, 32)), jnp.float32)
    perm = auction_assignment(M, max_rounds=2)  # far too few rounds
    p = np.asarray(perm)
    assert sorted(p.tolist()) == list(range(32)), p
    # And the converged solve is unaffected by the safety net.
    full = np.asarray(auction_assignment(M))
    assert sorted(full.tolist()) == list(range(32))


def test_degenerate_plan_warns_eagerly():
    """warn=True surfaces the uniform-plan fallback on the eager path
    (reference optimal_transport.py:88-97)."""
    import warnings as _w

    import numpy as np

    s = OTPlanSampler(method="sinkhorn", reg=0.05, warn=True)
    x0 = jnp.asarray(np.random.RandomState(3).randn(8, 2), jnp.float32)
    x0 = x0.at[0, 0].set(jnp.nan)  # NaN cost row -> non-finite plan
    x1 = jnp.asarray(np.random.RandomState(4).randn(8, 2), jnp.float32)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        plan = s.get_map(x0, x1)
    assert bool(jnp.allclose(plan, 1.0 / 64))
    assert any("Degenerate" in str(r.message) for r in rec)


def test_get_map_degenerate_status_and_marginal_guard():
    """return_status surfaces the uniform fallback in-jit; the balanced-
    method marginal check catches finite-but-garbage plans (underflowed reg
    gave a finite plan with row sums ~29x the marginals before this guard)."""
    k0, k1 = jax.random.split(jax.random.PRNGKey(3))
    x0 = jax.random.normal(k0, (16, 2))
    x1 = jax.random.normal(k1, (16, 2)) + 5.0

    s_ok = OTPlanSampler(method="sinkhorn", reg=0.5, warn=False)
    plan, bad = jax.jit(lambda a, b: s_ok.get_map(a, b, return_status=True))(x0, x1)
    assert not bool(bad)
    np.testing.assert_allclose(float(jnp.sum(plan)), 1.0, atol=1e-4)

    s_bad = OTPlanSampler(method="sinkhorn", reg=1e-30, warn=False)
    plan, bad = jax.jit(lambda a, b: s_bad.get_map(a, b, return_status=True))(x0, x1)
    assert bool(bad)
    # Fallback IS the uniform coupling.
    np.testing.assert_allclose(np.asarray(plan), 1.0 / 256.0, atol=1e-9)

    # sample_plan threads the same flag.
    x0c, x1c, bad2 = jax.jit(
        lambda k, a, b: s_bad.sample_plan(k, a, b, return_status=True)
    )(jax.random.PRNGKey(0), x0, x1)
    assert bool(bad2) and x0c.shape == x0.shape

    # exact stays healthy on the same inputs.
    s_exact = OTPlanSampler(method="exact")
    _, bad3 = jax.jit(lambda a, b: s_exact.get_map(a, b, return_status=True))(x0, x1)
    assert not bool(bad3)


def test_flash_sample_plan_degenerate_status():
    """The flash-Sinkhorn route reports its own convergence flag."""
    k0, k1 = jax.random.split(jax.random.PRNGKey(4))
    x0 = jax.random.normal(k0, (64, 2))
    x1 = jax.random.normal(k1, (64, 2)) + 5.0
    s = OTPlanSampler(method="sinkhorn", reg=1e-30, warn=False, flash=True)
    _, _, bad = jax.jit(
        lambda k, a, b: s.sample_plan(k, a, b, return_status=True)
    )(jax.random.PRNGKey(0), x0, x1)
    assert bool(bad)
    s_ok = OTPlanSampler(method="sinkhorn", reg=0.5, warn=False, flash=True)
    _, _, ok_bad = jax.jit(
        lambda k, a, b: s_ok.sample_plan(k, a, b, return_status=True)
    )(jax.random.PRNGKey(0), x0, x1)
    assert not bool(ok_bad)


def test_emd_annealed_single_phase_uses_final_reg():
    """num_phases=1 must run (and polish) at reg_final itself, not the
    scale/4 warm-start (review finding r5): the plan should be close to the
    annealed default's, not a near-uniform blur."""
    import numpy as np

    from cfm_tpu.ops.sinkhorn import emd_annealed

    rng = np.random.default_rng(0)
    n = 32
    M = jnp.asarray(rng.uniform(size=(n, n)).astype(np.float32))
    a = jnp.full((n,), 1.0 / n)
    b = jnp.full((n,), 1.0 / n)
    sharp = emd_annealed(a, b, M)                       # default phases
    one = emd_annealed(a, b, M, num_phases=1)
    cost_sharp = float(jnp.sum(sharp * M))
    cost_one = float(jnp.sum(one * M))
    cost_uniform = float(jnp.mean(M))
    # The single-phase solve lands near the annealed cost, far from uniform.
    assert abs(cost_one - cost_sharp) < 0.25 * (cost_uniform - cost_sharp), (
        cost_one, cost_sharp, cost_uniform)
