"""Variant-objective tests: SF2M schedule bridge, DSBM, reflow, action
matching, CNF NLL, ICNN duals, spline-CFM.

Oracle patterns per the reference variants (cfm_module.py:532-1455,
icnn_module.py): closed-form target checks where possible, train-improves
checks otherwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cfm_tpu.models import ICNN, MLP
from cfm_tpu.schedules import ConstantNoiseScheduler
from cfm_tpu.spline import SplineConditionalFlowMatcher, fit_natural_cubic_spline
from cfm_tpu.variants import (
    ScheduleBridgeMatcher,
    dsbm_targets,
    make_action_matching_loss,
    make_cnf_nll_loss,
    make_dsbm_loss,
    make_icnn_losses,
    reflow_pairs,
    straightness,
)


def test_schedule_bridge_reduces_to_sbcfm():
    """Constant schedule -> mu_t, sigma_t, ut match the SB-CFM closed form."""
    sigma = 0.7
    bridge = ScheduleBridgeMatcher(ConstantNoiseScheduler(sigma))
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.fold_in(key, 0), (64, 3))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (64, 3))
    s = bridge.sample_location_and_targets(key, x0, x1)
    t = s["t"][:, None]
    np.testing.assert_allclose(np.asarray(s["mu_t"]), np.asarray(t * x1 + (1 - t) * x0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s["sigma_t"]),
        sigma * np.sqrt(np.asarray(t) * (1 - np.asarray(t))),
        rtol=1e-4, atol=1e-5,
    )
    # ut = (1-2t)/(2t(1-t)) (xt - mu_t) + (x1 - x0), the SB-CFM drift.
    tt = np.asarray(t)
    num = sigma**2 * (1 - 2 * tt)
    den = 2 * sigma**2 * tt * (1 - tt) + 1e-8
    expected_ut = num / den * (np.asarray(s["xt"]) - np.asarray(s["mu_t"])) + np.asarray(x1 - x0)
    np.testing.assert_allclose(np.asarray(s["ut"]), expected_ut, rtol=1e-3, atol=1e-3)


def test_dsbm_targets_sum_to_bridge_identity():
    """fwd + bwd targets = -(g sqrt(t/(1-t)) + g sqrt((1-t)/t)) eps."""
    sched = ConstantNoiseScheduler(0.5)
    bridge = ScheduleBridgeMatcher(sched)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(jax.random.fold_in(key, 0), (32, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (32, 2))
    s = bridge.sample_location_and_targets(key, x0, x1)
    fwd, bwd, fs, bs_ = dsbm_targets(x0, x1, s, sched)
    t = s["t"][:, None]
    g = 0.5
    expected_sum = -(g * np.sqrt(t / (1 - t + 1e-6)) + g * np.sqrt((1 - t) / (t + 1e-6))) * np.asarray(s["eps"])
    np.testing.assert_allclose(np.asarray(fwd + bwd), expected_sum, rtol=1e-3, atol=1e-4)
    assert bool(jnp.all(fs > 0)) and bool(jnp.all(bs_ > 0))


def test_dsbm_loss_trains():
    key = jax.random.PRNGKey(2)
    fwd = MLP(dim=2, w=32)
    bwd = MLP(dim=2, w=32)
    params = {
        "forward": fwd.init(key, jnp.zeros((2,)), jnp.zeros((2, 2))),
        "backward": bwd.init(jax.random.fold_in(key, 1), jnp.zeros((2,)), jnp.zeros((2, 2))),
    }
    loss_fn = make_dsbm_loss(fwd.apply, bwd.apply, ConstantNoiseScheduler(0.3))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    losses = []
    for i in range(60):
        k = jax.random.fold_in(key, i)
        x0 = jax.random.normal(jax.random.fold_in(k, 0), (64, 2))
        x1 = jax.random.normal(jax.random.fold_in(k, 1), (64, 2)) + 2.0
        (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params, k, x0, x1)
        upd, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, upd)
        losses.append(float(l))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert np.isfinite(losses[-1])


def test_reflow_pairs_straightens():
    """Pairs regenerated from a frozen linear field lie on its flow."""
    model = MLP(dim=2, w=32)
    key = jax.random.PRNGKey(3)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    x0 = jax.random.normal(key, (16, 2))
    rx0, rx1 = reflow_pairs(model.apply, params, x0, n_steps=50)
    np.testing.assert_array_equal(np.asarray(rx0), np.asarray(x0))
    assert rx1.shape == x0.shape
    s = straightness(model.apply, params, key, x0, n_steps=10)
    assert np.isfinite(float(s))


def test_action_matching_gradient_flows():
    class Energy(MLP):
        pass

    e = MLP(dim=1, w=32)  # scalar output via dim=1? Use out_dim
    e = MLP(dim=2, out_dim=1, w=32)
    key = jax.random.PRNGKey(4)
    params = e.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    loss_fn = make_action_matching_loss(e.apply)
    x0 = jax.random.normal(jax.random.fold_in(key, 0), (32, 2))
    x1 = x0 + 1.0
    (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params, key, x0, x1)
    assert np.isfinite(float(l))
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(g))


def test_cnf_nll_decreases_with_training():
    model = MLP(dim=2, w=32)
    key = jax.random.PRNGKey(5)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    loss_fn = make_cnf_nll_loss(model.apply, n_steps=10)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    step = jax.jit(
        lambda p, s, k, x1: _cnf_step(loss_fn, opt, p, s, k, x1)
    )
    losses = []
    data_key = jax.random.PRNGKey(6)
    for i in range(40):
        k = jax.random.fold_in(key, i)
        x1 = 0.3 * jax.random.normal(jax.random.fold_in(data_key, i), (64, 2)) + 2.0
        params, opt_state, l = step(params, opt_state, k, x1)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def _cnf_step(loss_fn, opt, params, opt_state, key, x1):
    (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params, key, None, x1)
    upd, opt_state = opt.update(g, opt_state)
    return optax.apply_updates(params, upd), opt_state, l


def test_icnn_dual_losses_finite_and_trainable():
    f_mod = ICNN(dim=2, hidden_dims=(16, 16))
    g_mod = ICNN(dim=2, hidden_dims=(16, 16))
    key = jax.random.PRNGKey(7)
    f_params = f_mod.init(key, jnp.zeros((1, 2)))
    g_params = g_mod.init(jax.random.fold_in(key, 1), jnp.zeros((1, 2)))
    g_loss, f_loss, grad_g, w2_est = make_icnn_losses(f_mod, g_mod)
    x = jax.random.normal(jax.random.fold_in(key, 2), (64, 2))
    y = jax.random.normal(jax.random.fold_in(key, 3), (64, 2)) + 1.5
    (lg, _), gg = jax.value_and_grad(g_loss, has_aux=True)(g_params, f_params, x)
    (lf, _), gf = jax.value_and_grad(f_loss, has_aux=True)(f_params, g_params, x, y)
    assert np.isfinite(float(lg)) and np.isfinite(float(lf))
    t_map = grad_g(g_params, x)
    assert t_map.shape == x.shape
    assert np.isfinite(float(w2_est(f_params, g_params, x, y)))


def test_spline_cfm_linear_trajectory():
    """On a perfectly linear trajectory, spline path = line, ut = slope."""
    X = jnp.stack([jnp.zeros((32, 2)), jnp.ones((32, 2)), 2 * jnp.ones((32, 2))], axis=1)
    m = SplineConditionalFlowMatcher(sigma=0.0, ot_method="none")
    t, xt, ut = m.sample_location_and_conditional_flow(jax.random.PRNGKey(0), X)
    np.testing.assert_allclose(np.asarray(ut), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(t)[:, None] * np.ones((32, 2)), atol=1e-4)


def test_spline_interpolates_knots():
    ts = jnp.linspace(0, 3, 7)
    ys = jnp.stack([ts**2, jnp.sin(ts)], -1)[None]
    sp = fit_natural_cubic_spline(ts, ys)
    vals = jnp.stack([sp.evaluate(t_) for t_ in ts])
    np.testing.assert_allclose(np.asarray(vals[:, 0, :]), np.asarray(ys[0]), atol=1e-5)
    d = sp.derivative(jnp.asarray(1.5))
    np.testing.assert_allclose(np.asarray(d[0]), [3.0, np.cos(1.5)], atol=0.05)


def test_spline_cfm_with_ot_chaining():
    key = jax.random.PRNGKey(8)
    X = jax.random.normal(key, (16, 4, 3))
    m = SplineConditionalFlowMatcher(sigma=0.1, ot_method="exact")
    t, xt, ut = m.sample_location_and_conditional_flow(jax.random.fold_in(key, 1), X)
    assert t.shape == (16,) and xt.shape == (16, 3) and ut.shape == (16, 3)
    assert bool(jnp.all(jnp.isfinite(xt))) and bool(jnp.all(jnp.isfinite(ut)))


def test_ipf_resample_pairs():
    from cfm_tpu.schedules import ConstantNoiseScheduler
    from cfm_tpu.variants import ipf_resample_pairs

    model = MLP(dim=2, w=16)
    key = jax.random.PRNGKey(9)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    x0 = jax.random.normal(key, (32, 2))
    rx0, rx1 = ipf_resample_pairs(
        key, model.apply, params, x0,
        schedule=ConstantNoiseScheduler(0.2), n_steps=20,
    )
    np.testing.assert_array_equal(np.asarray(rx0), np.asarray(x0))
    assert rx1.shape == x0.shape and bool(jnp.all(jnp.isfinite(rx1)))
    bx0, bx1 = ipf_resample_pairs(
        key, model.apply, params, x0,
        schedule=ConstantNoiseScheduler(0.2), n_steps=20, reverse=True,
    )
    np.testing.assert_array_equal(np.asarray(bx1), np.asarray(x0))
    assert bool(jnp.all(jnp.isfinite(bx0)))


def test_average_ut_reduces_to_identity_for_self_only():
    from cfm_tpu.variants import average_ut

    key = jax.random.PRNGKey(10)
    x = jax.random.normal(key, (16, 2))
    ut = jax.random.normal(jax.random.fold_in(key, 1), (16, 2))
    out = average_ut(key, x, x, 0.1, ut, avg_size=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ut), rtol=1e-5)


def test_average_ut_weights_by_density():
    from cfm_tpu.variants import average_ut

    # Two far clusters: averaging must stay within each cluster.
    x = jnp.concatenate([jnp.zeros((8, 2)), 100.0 + jnp.zeros((8, 2))])
    ut = jnp.concatenate([jnp.ones((8, 2)), -jnp.ones((8, 2))])
    out = average_ut(jax.random.PRNGKey(0), x, x, 0.5, ut, avg_size=16)
    np.testing.assert_allclose(np.asarray(out[:8]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[8:]), -1.0, atol=1e-4)


def test_cnf_nll_adaptive_adjoint_matches_fixed_step():
    """CNF NLL at adaptive tolerances (continuous adjoint through dopri5)
    agrees with the fixed-step scan in loss AND parameter gradients, and one
    SGD step reduces the adaptive loss — the reference's torchdyn-adjoint
    CNF training mode (solver.py:192-216) at error-controlled step sizes."""
    from cfm_tpu.models import MLP
    from cfm_tpu.variants import make_cnf_nll_loss

    model = MLP(dim=2, w=32)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    params = jax.tree.map(lambda p: p + 0.03, params)
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (32, 2)) * 0.8

    fixed = make_cnf_nll_loss(model.apply, n_steps=400, divergence="exact")
    adapt = make_cnf_nll_loss(model.apply, divergence="exact", adaptive=True,
                              rtol=1e-6, atol=1e-6)
    kd = jax.random.fold_in(key, 2)
    (lf, _), gf = jax.value_and_grad(lambda p: fixed(p, kd, None, x1),
                                     has_aux=True)(params)
    (la, _), ga = jax.value_and_grad(lambda p: adapt(p, kd, None, x1),
                                     has_aux=True)(params)
    # The fixed path is 400 EULER steps (O(1/400) bias ~1e-3); the adaptive
    # path at 1e-6 is the more accurate of the two.
    np.testing.assert_allclose(float(la), float(lf), rtol=3e-3)
    flat_f = np.concatenate([np.ravel(l) for l in jax.tree.leaves(gf)])
    flat_a = np.concatenate([np.ravel(l) for l in jax.tree.leaves(ga)])
    cos = float(flat_f @ flat_a / (np.linalg.norm(flat_f) * np.linalg.norm(flat_a)))
    assert cos > 0.999, cos
    np.testing.assert_allclose(flat_a, flat_f, rtol=5e-2, atol=5e-3)

    p1 = jax.tree.map(lambda a, b: a - 0.002 * b, params, ga)
    la1 = float(adapt(p1, kd, None, x1)[0])
    assert la1 < float(la), (la1, float(la))


def test_oneway_dsbm_equals_dsbm_forward_half_and_trains():
    """make_oneway_dsbm_loss (OneWaySF2MLitModule, cfm_module.py:1088-1118)
    is exactly the forward half of the joint DSBM loss under the same key
    and forward params, and it trains."""
    from cfm_tpu.variants import make_oneway_dsbm_loss

    key = jax.random.PRNGKey(4)
    fwd = MLP(dim=2, w=32)
    bwd = MLP(dim=2, w=32)
    fparams = fwd.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    joint = {
        "forward": fparams,
        "backward": bwd.init(jax.random.fold_in(key, 1), jnp.zeros((2,)), jnp.zeros((2, 2))),
    }
    sched = ConstantNoiseScheduler(0.3)
    one = make_oneway_dsbm_loss(fwd.apply, sched)
    both = make_dsbm_loss(fwd.apply, bwd.apply, sched)
    x0 = jax.random.normal(jax.random.fold_in(key, 2), (64, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 3), (64, 2)) + 2.0
    l_one, m_one = one(fparams, key, x0, x1)
    l_joint, m_joint = both(joint, key, x0, x1)
    np.testing.assert_allclose(float(l_one), float(m_joint["fwd_loss"]), rtol=1e-6)

    opt = optax.adam(1e-3)
    opt_state = opt.init(fparams)
    losses = []
    for i in range(60):
        k = jax.random.fold_in(key, 10 + i)
        x0 = jax.random.normal(jax.random.fold_in(k, 0), (64, 2))
        x1 = jax.random.normal(jax.random.fold_in(k, 1), (64, 2)) + 2.0
        (l, _), g = jax.value_and_grad(one, has_aux=True)(fparams, k, x0, x1)
        upd, opt_state = opt.update(g, opt_state)
        fparams = optax.apply_updates(fparams, upd)
        losses.append(float(l))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert np.isfinite(losses[-1])


def test_sf2m_score_loss_formula_and_drift_helper():
    """sf2m_score_loss is mse(-2 sigma_t s / g^2, eps) (cfm_module.py:905-908)
    and dsbm_ode_drift is the probability-flow (f - b)/2 (solver.py:225-269)."""
    from cfm_tpu.variants import ScheduleBridgeMatcher, dsbm_ode_drift, sf2m_score_loss

    key = jax.random.PRNGKey(5)
    bridge = ScheduleBridgeMatcher(ConstantNoiseScheduler(0.5))
    x0 = jax.random.normal(jax.random.fold_in(key, 0), (32, 2))
    x1 = jax.random.normal(jax.random.fold_in(key, 1), (32, 2)) + 1.0
    sample = bridge.sample_location_and_targets(key, x0, x1)
    st = jax.random.normal(jax.random.fold_in(key, 2), (32, 2))
    got = float(sf2m_score_loss(st, sample))
    scaled = -2.0 * sample["sigma_t"] * st / (sample["g_t"] ** 2 + 1e-8)
    want = float(jnp.mean(jnp.square(scaled - sample["eps"])))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # Drift helper: linear fields f(x) = x + 1, b(x) = x - 1 -> drift == 1.
    params = {"forward": None, "backward": None}
    drift = dsbm_ode_drift(lambda p, t, x: x + 1.0, lambda p, t, x: x - 1.0, params)
    out = drift(0.3, jnp.zeros((4, 2)))
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_w2_estimate_point_mass_oracle():
    """Sign/scale oracle (review finding r5): x = 0, y = c with the exact
    transport potential g(x) = ||x||^2/2 + <c, x> (T = grad g = x + c) gives
    dual = 0 and the estimate must equal +(1/2)||c||^2 — the reference's
    (1/2) W2^2 convention (icnn_module.py:229-245), not its negative."""

    class Quad:
        """g(x) = ||x||^2/2 + <c, x>; f arbitrary (drops out at x = 0)."""

        def __init__(self, c):
            self.c = c

        def apply(self, params, x):
            return (0.5 * jnp.sum(x**2, 1) + x @ self.c)[:, None]

    c = jnp.array([3.0, -4.0])          # ||c||^2 = 25
    mod = Quad(c)
    _, _, grad_g, w2_est = make_icnn_losses(mod, mod)
    x = jnp.zeros((16, 2))
    y = jnp.broadcast_to(c, (16, 2))
    np.testing.assert_allclose(np.asarray(grad_g(None, x)), np.asarray(y), atol=1e-6)
    est = float(w2_est(None, None, x, y))
    np.testing.assert_allclose(est, 0.5 * 25.0, rtol=1e-6)


def test_ipf_resample_reverse_integrates_toward_x0():
    """Review finding r5: the backward drift b(t,x) = (c - x)/t is the ideal
    bridge drift toward x0 = c. ipf_resample_pairs(reverse=True) must carry
    x1 to (near) c — the old 1->0 grid stepped x += b*dt with dt < 0 and
    diverged AWAY from c."""
    from cfm_tpu.variants import ipf_resample_pairs

    c = jnp.array([2.0, -1.0])

    def b_apply(params, t, x):
        tt = jnp.clip(t[:, None], 1e-3, 1.0)
        return (c - x) / tt

    x1 = jnp.ones((64, 2)) * 10.0
    x0p, x1_back = ipf_resample_pairs(
        jax.random.PRNGKey(0), b_apply, None, x1,
        schedule=ConstantNoiseScheduler(1e-4), n_steps=100, reverse=True,
    )
    np.testing.assert_array_equal(np.asarray(x1_back), np.asarray(x1))
    err = float(jnp.max(jnp.abs(x0p - c)))
    assert err < 0.1, err      # lands on the x0 marginal, not at ~11x it


def test_straightness_rank3_states():
    """straightness broadcasts correctly for any state rank (review finding
    r5: rank-3 states hit a hardcoded rank-5 reshape and silently produced a
    cross-time-pair mean)."""
    from cfm_tpu.variants import straightness

    class Const:
        def apply(self, params, t, x):
            return jnp.ones_like(x)       # constant field -> perfectly straight

    s = float(straightness(Const().apply, None, jax.random.PRNGKey(0),
                           jnp.zeros((8, 3, 5)), n_steps=6))
    np.testing.assert_allclose(s, 0.0, atol=1e-10)


def test_spline_shared_broadcast_and_mispair_guard():
    """A shared spline (leading dim 1 or absent) broadcasts over a time
    vector; a mismatched leading dim raises instead of silently mispairing
    (review finding r5)."""
    ts = jnp.linspace(0, 3, 7)
    ys = jnp.stack([ts**2, jnp.sin(ts)], -1)[None]     # (1, 7, 2)
    sp = fit_natural_cubic_spline(ts, ys)
    tq = jnp.array([0.5, 1.5, 2.5])
    vals = sp.evaluate(tq)                             # broadcasts the one spline
    assert vals.shape == (3, 2)
    each = jnp.stack([sp.evaluate(t_)[0] for t_ in tq])
    np.testing.assert_allclose(np.asarray(vals), np.asarray(each), atol=1e-6)

    batched = fit_natural_cubic_spline(ts, jnp.broadcast_to(ys, (2, 7, 2)))
    with pytest.raises(ValueError, match="does not match"):
        batched.evaluate(tq)                           # 3 times vs 2 splines
