"""End-to-end training: the minimum slice (8gaussians -> moons) must learn.

This is the framework's Phase-1 gate (SURVEY.md section 7): icfm/otcfm path +
on-device coupling + MLP + Adam, a few hundred steps, then ODE generation and
a W2 check against the reference's 2D-tutorial behavior
(/root/reference/examples/2D_tutorials/*.ipynb). Also covers the train-step
factory, EMA, and the data-parallel sharded step on the virtual 8-CPU mesh
(the reference's ddp_sim analogue, runner/configs/trainer/ddp_sim.yaml).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu import (
    ConditionalFlowMatcher,
    ExactOptimalTransportConditionalFlowMatcher,
)
from cfm_tpu.coupling import wasserstein
from cfm_tpu.data import eight_gaussians, sample_moons
from cfm_tpu.integrate import odeint, vector_field_from_model
from cfm_tpu.models import MLP
from cfm_tpu.train import (
    TrainState,
    init_train_state,
    make_data_parallel_step,
    make_mesh,
    make_optimizer,
    make_train_step,
)


def _train_2d(matcher, steps=300, batch=256, seed=0):
    model = MLP(dim=2, w=64)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=2e-3, warmup_steps=0, grad_clip=1.0)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(matcher, model.apply, opt, ema_decay=0.99))

    losses = []
    for i in range(steps):
        key, k0, k1, ks = jax.random.split(key, 4)
        x0 = eight_gaussians(k0, batch)
        x1 = sample_moons(k1, batch)
        state, metrics = step(state, ks, x0, x1)
        losses.append(float(metrics["loss"]))
    return model, state, losses


def test_icfm_2moons_end_to_end():
    matcher = ConditionalFlowMatcher(sigma=0.1)
    model, state, losses = _train_2d(matcher)
    # I-CFM loss has a large irreducible floor (the conditional variance of
    # x1-x0 under independent coupling), so only a modest drop from the very
    # first steps is expected; the real check is the W2 transport below.
    assert np.mean(losses[-20:]) < 0.85 * np.mean(losses[:3]), (
        np.mean(losses[:3]), np.mean(losses[-20:]))

    # Generate by integrating the learned field from the source distribution.
    key = jax.random.PRNGKey(123)
    x0 = eight_gaussians(jax.random.fold_in(key, 0), 512)
    f = vector_field_from_model(model.apply, state.ema_params)
    gen = odeint(f, x0, jnp.linspace(0, 1, 101), method="euler").final
    target = sample_moons(jax.random.fold_in(key, 1), 512)
    w2_model = float(wasserstein(gen, target, power=2))
    w2_source = float(wasserstein(x0, target, power=2))
    # The flow must transport much closer to the moons than the source is.
    assert w2_model < 0.5 * w2_source, (w2_model, w2_source)


def test_otcfm_trains_and_couples_on_device():
    matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.1)
    _, state, losses = _train_2d(matcher, steps=200)
    assert np.mean(losses[-20:]) < np.mean(losses[:20])
    assert int(state.step) == 200


def test_train_state_ema_tracks_params():
    matcher = ConditionalFlowMatcher(sigma=0.1)
    _, state, _ = _train_2d(matcher, steps=30)
    # EMA with decay 0.99 over 30 steps differs from params but not wildly.
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.params, state.ema_params)
    max_diff = max(jax.tree.leaves(diffs))
    assert 0.0 < max_diff < 1.0


def test_data_parallel_step_on_virtual_mesh():
    """Sharded step on the 8-device CPU mesh equals the expected API shape.

    TPU analogue of the reference's 2-process ddp_sim test
    (runner/tests/test_train.py:52-62) — but actually passing.
    """
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    matcher = ConditionalFlowMatcher(sigma=0.1)
    model = MLP(dim=2, w=32)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=1e-3, warmup_steps=10)
    state = init_train_state(params, opt)
    mesh = make_mesh()
    step = make_data_parallel_step(make_train_step(matcher, model.apply, opt), mesh)

    n_dev = len(jax.devices())
    batch = 16 * n_dev
    for i in range(3):
        key, k0, k1, ks = jax.random.split(key, 4)
        x0 = eight_gaussians(k0, batch)
        x1 = sample_moons(k1, batch)
        state, metrics = step(state, ks, x0, x1)
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss"]))


def test_local_coupling_shard_map_step():
    """shard_map wrapper: per-shard OT coupling + psum'd grads on the CPU mesh.

    Covers the reference DDP semantics (per-rank coupling,
    train_cifar10_ddp.py:156-171) as a sharding mode, not a separate script.
    """
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from cfm_tpu.parallel import make_mesh as pmesh
    from cfm_tpu.parallel.mesh import local_coupling_step

    matcher = ConditionalFlowMatcher(sigma=0.1)
    model = MLP(dim=2, w=32)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=1e-3, warmup_steps=0)
    state = init_train_state(params, opt)
    mesh = pmesh()
    inner = make_train_step(matcher, model.apply, opt, ema_decay=0.99, data_axis="data")
    step = jax.jit(local_coupling_step(inner, mesh))

    n_dev = len(jax.devices())
    batch = 8 * n_dev
    key, k0, k1, ks = jax.random.split(key, 4)
    x0 = eight_gaussians(k0, batch)
    x1 = sample_moons(k1, batch)
    state, metrics = step(state, ks, x0, x1)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


def test_replicated_coupling_data_parallel_step():
    """make_data_parallel_train_step: the global OT coupling runs replicated
    on every device, the model fwd/bwd runs per-shard INSIDE shard_map
    (manual mesh axes — Pallas custom calls have no GSPMD partitioning rule,
    so the whole step lives in manual mode, round 4). The oracle reproduces
    the exact per-shard decomposition on one device: couple the global batch
    with kc, then for every shard i fold the device index into the key,
    compute the inner loss/grads on shard i's rows, average, and apply one
    optimizer update — parameters and loss must match to float tolerance."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    import optax

    from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
    from cfm_tpu.train import make_data_parallel_train_step

    matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.1)
    model = MLP(dim=2, w=32)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=1e-3, warmup_steps=10)
    mesh = make_mesh()
    n_dev = len(jax.devices())
    batch = 8 * n_dev

    # Fresh copies: dp_step donates its state, which would delete the param
    # buffers the oracle below still needs.
    dp_state = init_train_state(jax.tree.map(jnp.copy, params), opt)
    dp_step = make_data_parallel_train_step(matcher, model.apply, opt, mesh)

    key, k0, k1, ks = jax.random.split(key, 4)
    x0 = eight_gaussians(k0, batch)
    x1 = sample_moons(k1, batch)

    dp_state, dp_metrics = dp_step(dp_state, ks, x0, x1)

    # Oracle: identical PRNG decomposition, single device.
    kc, kstep = jax.random.split(ks)
    x0c, x1c = matcher.ot_sampler.sample_plan(kc, x0, x1)
    uncoupled = matcher.without_coupling()

    def shard_loss(p, skey, xs0, xs1):
        # make_train_step.loss_fn's exact key discipline.
        skey, _drop, _sdrop = jax.random.split(skey, 3)
        t, xt, ut, eps = uncoupled.sample_location_and_conditional_flow(
            skey, xs0, xs1, return_noise=True
        )
        vt = model.apply(p, t, xt)
        return jnp.mean(jnp.square(vt - ut))

    shard = batch // n_dev
    losses, grads = [], []
    for i in range(n_dev):
        ki = jax.random.fold_in(kstep, i)
        l, g = jax.value_and_grad(shard_loss)(
            params, ki, x0c[i * shard:(i + 1) * shard],
            x1c[i * shard:(i + 1) * shard])
        losses.append(l)
        grads.append(g)
    mean_grads = jax.tree.map(lambda *gs: sum(gs) / n_dev, *grads)
    sd_state = init_train_state(jax.tree.map(jnp.copy, params), opt)
    updates, _ = opt.update(mean_grads, sd_state.opt_state, sd_state.params)
    sd_params = optax.apply_updates(sd_state.params, updates)

    assert int(dp_state.step) == 1
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(np.mean(losses)), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(dp_state.params), jax.tree.leaves(sd_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert float(dp_metrics["coupling_degenerate"]) == 0.0


def test_without_coupling_preserves_path_math():
    """matcher.without_coupling() keeps mu/sigma/u_t and compute_lambda but
    skips the OT re-pairing: with identity-friendly inputs the uncoupled
    sample equals the base-class formulas."""
    from cfm_tpu import SchrodingerBridgeConditionalFlowMatcher

    m = SchrodingerBridgeConditionalFlowMatcher(sigma=0.5)
    mu = m.without_coupling()
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    x1 = jax.random.normal(jax.random.PRNGKey(2), (16, 2))
    t, xt, ut = mu.sample_location_and_conditional_flow(key, x0, x1)
    # Same key, same draw: the uncoupled output must be reproducible and use
    # the SB path (sigma_t > 0 noise scale differs from plain CFM).
    t2, xt2, ut2 = mu.sample_location_and_conditional_flow(key, x0, x1)
    np.testing.assert_array_equal(np.asarray(xt), np.asarray(xt2))
    np.testing.assert_array_equal(np.asarray(ut), np.asarray(ut2))
    # And the original matcher still couples (different stream split).
    t3, xt3, ut3 = m.sample_location_and_conditional_flow(key, x0, x1)
    assert not np.array_equal(np.asarray(xt), np.asarray(xt3))


# ---------------------------------------------------------------------------
# bf16 numerics guard: the framework's claim that bf16 compute + f32
# params/GroupNorm replaces the reference's fp16 loss-scaling machinery
# (models/unet.py:13-16 vs reference fp16_util.py:1-216) must stay measured,
# not asserted — kernel changes cannot silently break bf16 training.
# ---------------------------------------------------------------------------


def _train_small_unet(dtype, n_steps, key):
    from cfm_tpu import ConditionalFlowMatcher
    from cfm_tpu.models import UNetModelWrapper
    from cfm_tpu.train import init_train_state, make_optimizer, make_train_step

    model = UNetModelWrapper(
        dim=(32, 32, 3), num_channels=16, channel_mult=(1, 2),
        num_res_blocks=1, num_heads=2, num_head_channels=-1,
        attention_resolutions="16", dropout=0.0, dtype=dtype,
    )
    params = model.init(jax.random.fold_in(key, 0),
                        jnp.zeros((2,)), jnp.zeros((2, 32, 32, 3)))
    matcher = ConditionalFlowMatcher(sigma=0.1)
    opt = make_optimizer(lr=1e-3, warmup_steps=10, grad_clip=1.0)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(matcher, model.apply, opt, ema_decay=0.99))
    kd = jax.random.fold_in(key, 1)
    x1 = jax.random.normal(kd, (16, 32, 32, 3)) * 0.5 + 0.25  # fixed "data"
    losses = []
    k = jax.random.fold_in(key, 2)
    for i in range(n_steps):
        k, ks, kn = jax.random.split(k, 3)
        x0 = jax.random.normal(kn, (16, 32, 32, 3))
        state, m = step(state, ks, x0, x1)
        losses.append(float(m["loss"]))
    return np.asarray(losses)


def _assert_bf16_tracks_f32(n_steps):
    key = jax.random.PRNGKey(7)
    l32 = _train_small_unet(jnp.float32, n_steps, key)
    l16 = _train_small_unet(jnp.bfloat16, n_steps, key)
    assert np.all(np.isfinite(l16)), l16
    # Same keys, same data: trajectories must agree closely early (before
    # rounding drift compounds) and statistically over the tail.
    head = max(3, n_steps // 10)
    np.testing.assert_allclose(l16[:head], l32[:head], rtol=0.05)
    tail = n_steps // 5
    m32, m16 = l32[-tail:].mean(), l16[-tail:].mean()
    assert abs(m16 - m32) / m32 < 0.10, (m16, m32)
    # Both trained: tail loss below the first step's (25 smoke steps only
    # buy ~10%; the CFM_TPU_SLOW 200-step run shows the full descent).
    frac = 0.95 if n_steps < 100 else 0.8
    assert m16 < frac * l16[0] and m32 < frac * l32[0], (l16[0], m16)


def test_bf16_matches_f32_smoke():
    _assert_bf16_tracks_f32(25)


@pytest.mark.skipif(
    not os.environ.get("CFM_TPU_SLOW"),
    reason="200-step bf16-vs-f32 trajectory agreement; set CFM_TPU_SLOW=1",
)
def test_bf16_matches_f32_200_steps():
    _assert_bf16_tracks_f32(200)


def test_data_parallel_sampling_matches_single_device():
    """Batch-sharded ODE generation over the 8-device mesh equals the
    single-device program SAMPLE-FOR-SAMPLE (partitionable threefry makes
    the sharded source draw identical), and the compiled program contains
    no collectives — sampling scales linearly by construction (the BASELINE
    driver target: sampling throughput at 1 chip / 1 host / N hosts)."""
    from cfm_tpu.models import MLP
    from cfm_tpu.train import make_data_parallel_sample_fn, make_mesh

    model = MLP(dim=2, w=32)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    params = jax.tree.map(lambda p: p + 0.05, params)  # non-trivial field

    mesh8 = make_mesh()
    mesh1 = make_mesh(1)
    n = 64
    fn8 = make_data_parallel_sample_fn(model.apply, mesh8, n, (2,),
                                       method="euler", n_steps=20)
    fn1 = make_data_parallel_sample_fn(model.apply, mesh1, n, (2,),
                                       method="euler", n_steps=20)
    kd = jax.random.fold_in(key, 7)
    out8 = np.asarray(fn8(params, kd))
    out1 = np.asarray(fn1(params, kd))
    assert out8.shape == (n, 2)
    np.testing.assert_allclose(out8, out1, atol=1e-6)

    # No cross-device communication in the compiled SPMD program.
    hlo = fn8.lower(params, kd).compile().as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "reduce-scatter", "all-to-all"):
        assert coll not in hlo, coll


def test_coupling_degenerate_metric_fires_in_jit():
    """VERDICT r3 item 2: a Sinkhorn coupling whose reg underflows the cost
    scale degenerates INSIDE the compiled step; the coupling_degenerate
    metric must surface it (the reference prints eagerly,
    optimal_transport.py:88-97 — a jitted step cannot)."""
    from cfm_tpu import SchrodingerBridgeConditionalFlowMatcher

    # sigma=2e-6 -> ot_sampler reg = 2*sigma^2 = 8e-12: exp(-M/reg) under-
    # flows for any O(1) cost, so the plan collapses every step.
    with pytest.warns(UserWarning, match="numerical instability"):
        matcher = SchrodingerBridgeConditionalFlowMatcher(
            sigma=2e-6, ot_method="sinkhorn"
        )
    matcher.ot_sampler.warn = False
    model = MLP(dim=2, w=16)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=1e-3, warmup_steps=0, grad_clip=1.0)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(matcher, model.apply, opt))
    k0, k1, ks = jax.random.split(key, 3)
    x0 = jax.random.normal(k0, (32, 2))
    x1 = jax.random.normal(k1, (32, 2)) + 5.0
    _, metrics = step(state, ks, x0, x1)
    assert float(metrics["coupling_degenerate"]) == 1.0
    assert np.isfinite(float(metrics["loss"]))

    # Healthy exact-OT coupling reports 0.0.
    matcher_ok = ExactOptimalTransportConditionalFlowMatcher(sigma=0.1)
    step_ok = jax.jit(make_train_step(matcher_ok, model.apply, opt))
    _, metrics_ok = step_ok(init_train_state(params, opt), ks, x0, x1)
    assert float(metrics_ok["coupling_degenerate"]) == 0.0

    # Uncoupled matchers always report 0.0 (flag exists for homogeneity).
    step_icfm = jax.jit(make_train_step(ConditionalFlowMatcher(sigma=0.1),
                                        model.apply, opt))
    _, metrics_icfm = step_icfm(init_train_state(params, opt), ks, x0, x1)
    assert float(metrics_icfm["coupling_degenerate"]) == 0.0


def test_train_step_deterministic_in_key():
    """Same key + same state => bitwise-identical metrics and params (the
    reference's trainer.deterministic analogue, SURVEY §5 — every source of
    randomness in the fused step is the explicit PRNG key, so reruns are
    exact; catches any accidental nondeterminism added to the step)."""
    matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.1)
    model = MLP(dim=2, w=32)
    key = jax.random.PRNGKey(7)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=1e-3, warmup_steps=0)
    step = jax.jit(make_train_step(matcher, model.apply, opt))
    k0, k1, ks = jax.random.split(key, 3)
    x0 = eight_gaussians(k0, 64)
    x1 = sample_moons(k1, 64)

    outs = []
    for _ in range(2):
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        state, metrics = step(state, ks, x0, x1)
        outs.append((state, metrics))
    (s1, m1), (s2, m2) = outs
    np.testing.assert_array_equal(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
