"""Data pipeline tests: toy generators, image transforms, trajectory tools.

Shape/dtype/statistics invariants in the spirit of the reference's
datamodule tests (runner/tests/test_datamodule.py:11-50).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu.data import two_dim_data
from cfm_tpu.data.images import (
    infinite_batches,
    load_cifar10,
    load_mnist,
    normalize_images,
    random_hflip,
)
from cfm_tpu.data.toy import _REGISTRY
from cfm_tpu.data.trajectory import (
    circle_population,
    leaveout_adjusted_targets,
    resample_to_trajectory,
    sample_segment_pairs,
    tree_population,
    whiten,
)


def test_all_toy_generators_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    for name in _REGISTRY:
        gen = two_dim_data(name)
        a = gen(key, 128)
        b = gen(key, 128)
        want_dim = 10 if name == "funnel" else 2  # funnel.yaml default dim
        assert a.shape == (128, want_dim), name
        assert bool(jnp.all(jnp.isfinite(a))), name
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # keyed determinism


def test_funnel_law_and_dim_plumbing():
    """Neal's funnel (distribution_datamodule.py:488-491): x0 ~ N(0,1) and
    x_{1:} | x0 ~ N(0, exp(x0)) — whitening by exp(-x0/2) recovers N(0,1)."""
    x = two_dim_data("funnel", dim=6)(jax.random.PRNGKey(0), 20000)
    assert x.shape == (20000, 6)
    x0 = np.asarray(x[:, :1])
    np.testing.assert_allclose(x0.mean(), 0.0, atol=0.03)
    np.testing.assert_allclose(x0.std(), 1.0, rtol=0.03)
    z = np.asarray(x[:, 1:]) * np.exp(-x0 / 2.0)
    np.testing.assert_allclose(z.mean(), 0.0, atol=0.03)
    np.testing.assert_allclose(z.std(), 1.0, rtol=0.03)
    # dim flows to dimension-aware generators; 2-D-only generators reject it.
    assert two_dim_data("gaussian", dim=7)(jax.random.PRNGKey(1), 4).shape == (4, 7)
    with pytest.raises(ValueError):
        two_dim_data("moons", dim=7)


def test_moons_and_8gaussians_reference_scaling():
    key = jax.random.PRNGKey(1)
    m = two_dim_data("moons")(key, 4096)
    g = two_dim_data("8gaussians")(key, 4096)
    # torchcfm scalings: moons*3-1 spans roughly [-4, 2]^2; 8gaussians radius
    # 5*sqrt(2)/2 ~ 3.5.
    assert float(jnp.abs(m).max()) < 6.0
    radius = jnp.sqrt(jnp.sum(jnp.square(g), axis=1))
    assert 3.0 < float(jnp.median(radius)) < 4.0


def test_synthetic_image_loaders():
    x, y = load_cifar10(synthetic=True)
    assert x.shape[1:] == (32, 32, 3) and x.dtype == np.uint8
    x, y = load_mnist(synthetic=True)
    assert x.shape[1:] == (28, 28, 1) and y.dtype == np.int32


def test_normalize_and_flip():
    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (8, 32, 32, 3), np.uint8))
    n = normalize_images(x)
    assert float(n.min()) >= -1.0 and float(n.max()) <= 1.0
    f = random_hflip(jax.random.PRNGKey(0), n)
    assert f.shape == n.shape
    # Each sample is either identical or exactly mirrored.
    for i in range(8):
        same = np.array_equal(np.asarray(f[i]), np.asarray(n[i]))
        flipped = np.array_equal(np.asarray(f[i]), np.asarray(n[i, :, ::-1, :]))
        assert same or flipped


def test_infinite_batches_covers_dataset():
    data = np.arange(100)[:, None]
    it = infinite_batches(data, None, 10, seed=0)
    seen = set()
    for _ in range(10):
        batch = next(it)
        seen.update(batch[:, 0].tolist())
    assert seen == set(range(100))


def test_segment_pairs_basic():
    X = jnp.arange(5)[None, :, None] * jnp.ones((64, 1, 1))
    x0, x1, tsel = sample_segment_pairs(jax.random.PRNGKey(0), X)
    np.testing.assert_allclose(np.asarray(x1 - x0), 1.0)
    assert int(tsel.min()) >= 0 and int(tsel.max()) <= 3


def test_segment_pairs_leaveout():
    X = jnp.arange(5)[None, :, None] * jnp.ones((256, 1, 1))
    x0, x1, tsel = sample_segment_pairs(
        jax.random.PRNGKey(0), X, leaveout_timepoint=2, training=True
    )
    # No segment starts at the left-out timepoint; segments ending there jump.
    assert 2 not in set(np.asarray(tsel).tolist())
    gaps = np.asarray(x1 - x0)[:, 0]
    starts = np.asarray(tsel)
    assert set(np.unique(gaps[starts == 1])) == {2.0}  # 1 -> 3 straddles
    assert set(np.unique(gaps[starts != 1])) == {1.0}


def test_leaveout_adjusted_targets():
    ut = jnp.ones((4, 2))
    t = jnp.full((4,), 0.3)
    tsel = jnp.array([0, 1, 2, 3])
    ut2, t2 = leaveout_adjusted_targets(ut, t, tsel, leaveout_timepoint=2)
    np.testing.assert_allclose(np.asarray(ut2[1]), 0.5)  # straddling pair halves
    np.testing.assert_allclose(np.asarray(t2[1]), 0.6)
    np.testing.assert_allclose(np.asarray(ut2[0]), 1.0)


def test_populations_and_resample():
    key = jax.random.PRNGKey(2)
    X = tree_population(key, 64, T=4)
    assert X.shape == (64, 4, 2)
    X = circle_population(key, 64, T=3)
    assert X.shape == (64, 3, 2)
    marg = [np.random.default_rng(i).normal(size=(50 + i * 10, 3)) for i in range(3)]
    batch = resample_to_trajectory(key, marg, 32)
    assert batch.shape == (32, 3, 3)
    white, mu, std = whiten(marg)
    full = np.concatenate(white)
    np.testing.assert_allclose(full.mean(0), 0.0, atol=1e-6)
    np.testing.assert_allclose(full.std(0), 1.0, atol=1e-2)


def test_cycle_population():
    from cfm_tpu.data.trajectory import cycle_population

    X = cycle_population(jax.random.PRNGKey(3), 64, T=5)
    assert X.shape == (64, 5, 2)
    # Half-cycle phase step: marginals two timepoints apart coincide.
    np.testing.assert_allclose(
        np.asarray(X[:, 0]).mean(0), np.asarray(X[:, 2]).mean(0), atol=0.1
    )


def test_eight_normal_sample_layout():
    """Reference-layout generator: radius-scale centers in dims 0:2, general dim."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from cfm_tpu.data.toy import eight_normal_sample

    x = eight_normal_sample(jax.random.PRNGKey(0), 8192, dim=5, scale=4.0, var=0.01)
    assert x.shape == (8192, 5)
    # First-two-coordinate radii concentrate near the scale.
    r = jnp.linalg.norm(x[:, :2], axis=-1)
    np.testing.assert_allclose(float(r.mean()), 4.0, rtol=0.02)
    # Remaining dims are pure zero-mean noise with std sqrt(var).
    np.testing.assert_allclose(float(x[:, 2:].std()), 0.1, rtol=0.05)
    assert abs(float(x[:, 2:].mean())) < 0.01
    with pytest.raises(ValueError):
        eight_normal_sample(jax.random.PRNGKey(0), 4, dim=1)


# ---------------------------------------------------------------------------
# Precomputed joint-plan (geodesic datamodule) path — VERDICT r3 item 5.
# Reference: distribution_datamodule.py:190-281 + cfm_module.py:180-189.
# ---------------------------------------------------------------------------


def _perm_plan(n, perm):
    pi = np.zeros((n, n))
    pi[np.arange(n), perm] = 1.0 / n
    return pi


def test_joint_plan_sampler_honors_plans():
    """With permutation plans, every sampled pair must be the plan's pair."""
    from cfm_tpu.data.trajectory import make_joint_plan_sampler

    rng = np.random.default_rng(0)
    T, n, d = 3, 8, 2
    marginals = [rng.normal(size=(n, d)).astype(np.float32) for _ in range(T)]
    perms = [rng.permutation(n) for _ in range(T - 1)]
    plans = [_perm_plan(n, p) for p in perms]
    sample = make_joint_plan_sampler(marginals, plans)
    x0, x1, t_sel = jax.jit(sample, static_argnums=1)(jax.random.PRNGKey(0), 256)
    assert x0.shape == (256, d) and t_sel.shape == (256,)
    x0n, x1n, ts = np.asarray(x0), np.asarray(x1), np.asarray(t_sel)
    for b in range(256):
        t = int(ts[b])
        src = marginals[t]
        i = int(np.argmin(np.linalg.norm(src - x0n[b], axis=1)))
        np.testing.assert_allclose(x0n[b], src[i], atol=1e-6)
        np.testing.assert_allclose(
            x1n[b], marginals[t + 1][perms[t][i]], atol=1e-6
        )
    # Both segments get drawn.
    assert set(np.unique(ts)) == {0, 1}


def test_joint_plan_sampler_weighted_rows():
    """Non-degenerate plan rows are sampled with the right conditional law."""
    from cfm_tpu.data.trajectory import make_joint_plan_sampler

    marginals = [np.zeros((1, 1), np.float32),
                 np.array([[0.0], [1.0], [2.0]], np.float32)]
    pi = np.array([[0.5, 0.25, 0.25]])
    sample = make_joint_plan_sampler(marginals, [pi])
    _, x1, _ = sample(jax.random.PRNGKey(1), 4000)
    vals, counts = np.unique(np.asarray(x1).ravel(), return_counts=True)
    freqs = dict(zip(vals.tolist(), (counts / 4000).tolist()))
    assert abs(freqs[0.0] - 0.5) < 0.05
    assert abs(freqs[1.0] - 0.25) < 0.05
    assert abs(freqs[2.0] - 0.25) < 0.05


def test_joint_plan_sampler_leaveout_straddle():
    from cfm_tpu.data.trajectory import make_joint_plan_sampler

    rng = np.random.default_rng(1)
    T, n = 4, 6
    marginals = [rng.normal(size=(n, 2)).astype(np.float32) for _ in range(T)]
    ident = _perm_plan(n, np.arange(n))
    plans = [ident] * (T - 1)
    straddle = [_perm_plan(n, np.arange(n))] * (T - 2)
    sample = make_joint_plan_sampler(
        marginals, plans, leaveout_timepoint=2, straddle_plans=straddle
    )
    x0, x1, t_sel = sample(jax.random.PRNGKey(2), 512)
    ts = np.asarray(t_sel)
    assert 2 not in set(np.unique(ts))  # never starts at the left-out point
    # Segment 1 straddles: its x1 rows come from marginal 3, not marginal 2.
    x1n = np.asarray(x1)
    for b in np.where(ts == 1)[0][:32]:
        d2 = np.linalg.norm(marginals[2] - x1n[b], axis=1).min()
        d3 = np.linalg.norm(marginals[3] - x1n[b], axis=1).min()
        assert d3 < 1e-5 and d2 > 1e-3


def test_load_h5ad_joint_plans_roundtrip(tmp_path):
    """End-to-end: write a synthetic .h5ad with uns plans, load, train one
    segment from the precomputed coupling."""
    import h5py

    from cfm_tpu.data.trajectory import (
        load_h5ad_joint_plans,
        load_h5ad_timeseries,
        make_joint_plan_sampler,
    )

    rng = np.random.default_rng(2)
    T, n, d = 3, 16, 4
    emb = rng.normal(size=(T * n, d)).astype(np.float32)
    days = np.repeat(np.arange(T, dtype=np.float64), n)
    path = str(tmp_path / "toy.h5ad")
    with h5py.File(path, "w") as f:
        f.create_group("obsm").create_dataset("X_pca", data=emb)
        f.create_group("obs").create_dataset("day", data=days)
        uns = f.create_group("uns")
        for t in range(T - 1):
            uns.create_dataset(f"pi_{t}_{t+1}", data=_perm_plan(n, rng.permutation(n)))

    marginals, times = load_h5ad_timeseries(path, max_dim=d)
    plans, straddle = load_h5ad_joint_plans(path, T)
    assert straddle is None and len(plans) == T - 1
    sample = make_joint_plan_sampler(marginals, plans)

    from cfm_tpu import ConditionalFlowMatcher
    from cfm_tpu.models import MLP
    from cfm_tpu.train import init_train_state, make_optimizer, make_train_step

    model = MLP(dim=d, w=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, d)))
    opt = make_optimizer(lr=1e-3, warmup_steps=0)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(ConditionalFlowMatcher(sigma=0.1), model.apply, opt))
    x0, x1, _ = sample(jax.random.PRNGKey(3), 64)
    state, metrics = step(state, jax.random.PRNGKey(4), x0, x1)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_leaveout_last_timepoint_never_sampled():
    """Holding out the LAST timepoint must exclude the final segment (the
    reference's randint(times-2) support, cfm_module.py:167-171); the old
    guard silently trained on the held-out marginal (review finding r5)."""
    X = jnp.arange(5)[None, :, None] * jnp.ones((512, 1, 1))
    x0, x1, tsel = sample_segment_pairs(
        jax.random.PRNGKey(0), X, leaveout_timepoint=4, training=True
    )
    ts = set(np.asarray(tsel).tolist())
    assert ts <= {0, 1, 2} and 3 not in ts       # segment 3 ends at t=4
    assert float(jnp.max(x1)) <= 3.0             # never touches X[:, 4]
    # And the straddle-halving never fires for these genuine 1-step pairs.
    from cfm_tpu.data.trajectory import leaveout_adjusted_targets

    ut, t = leaveout_adjusted_targets(
        jnp.ones((512, 1)), jnp.full((512,), 0.25), tsel, leaveout_timepoint=4
    )
    np.testing.assert_allclose(np.asarray(ut), 1.0)


def test_joint_plan_sampler_leaveout_last():
    from cfm_tpu.data.trajectory import make_joint_plan_sampler

    rng = np.random.default_rng(3)
    T, n = 4, 6
    marginals = [rng.normal(size=(n, 2)).astype(np.float32) for _ in range(T)]
    plans = [_perm_plan(n, np.arange(n))] * (T - 1)
    sample = make_joint_plan_sampler(marginals, plans, leaveout_timepoint=T - 1)
    _, x1, t_sel = sample(jax.random.PRNGKey(0), 256)
    assert set(np.asarray(t_sel).tolist()) <= {0, 1}
    # x1 rows never come from the held-out last marginal.
    d_last = np.linalg.norm(
        marginals[T - 1][None, :, :] - np.asarray(x1)[:, None, :], axis=2
    ).min()
    assert d_last > 1e-3


def test_pinwheel_matches_reference_oracle():
    """Pinwheel parity vs an inline numpy re-implementation of the reference
    (two_dim.py:50-68): same stds/rate/scale AND the same rotation direction
    — the mirrored (column-vector) rotation moves exact-assignment W2 far
    from zero (review finding r5)."""
    from cfm_tpu.coupling import wasserstein

    n = 1500
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n, 2)) * np.array([0.3, 0.1]) + np.array([1.0, 0.0])
    labels = rng.integers(0, 5, n)
    angles = labels * (2 * np.pi / 5) + 0.25 * np.exp(feats[:, 0])
    c, s = np.cos(angles), np.sin(angles)
    ref = 7.5 * np.stack([c * feats[:, 0] + s * feats[:, 1],
                          -s * feats[:, 0] + c * feats[:, 1]], -1).astype(np.float32)
    ours = np.asarray(two_dim_data("pinwheel")(jax.random.PRNGKey(0), n))
    mirror = ours * np.array([1.0, -1.0], np.float32)
    w_ref = float(wasserstein(jnp.asarray(ours), jnp.asarray(ref), power=2))
    w_mir = float(wasserstein(jnp.asarray(mirror), jnp.asarray(ref), power=2))
    assert w_ref < 1.0 < w_mir, (w_ref, w_mir)   # right chirality, right scale
