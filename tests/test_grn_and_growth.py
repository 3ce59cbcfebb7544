"""GRN nets, graph metrics, growth-interpolation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cfm_tpu.eval.graphs import (
    compare_graphs,
    compare_graphs_bayesian_shd,
    structural_hamming_distance,
)
from cfm_tpu.eval.growth import (
    earth_mover_distance,
    interpolate_per_point_with_ot,
    interpolate_with_ot,
)
from cfm_tpu.models.grn import MLPODEF, make_ensemble


def test_mlpodef_shapes_and_structure():
    d, k = 5, 8
    model = MLPODEF(dims=[d, k, 1])
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, d))
    params = model.init(key, jnp.zeros(()), x)
    v = model.apply(params, 0.0, x)
    assert v.shape == (16, d)
    A = model.get_structure(params)
    assert A.shape == (d, d)
    assert bool(jnp.all(A >= 0))
    assert float(model.l1_reg(params)) > 0
    assert float(model.l2_reg(params)) > 0
    assert float(model.group_lasso_reg(params)) > 0
    grn = jnp.eye(d)
    assert float(model.grn_reg(params, grn)) > 0


def test_mlpodef_structure_recovery():
    """Train on a linear system x' = x @ A.T with sparse A; the recovered
    edge scores must rank true edges above absent ones."""
    d = 4
    A_true = jnp.array([
        [0.0, 1.5, 0.0, 0.0],
        [0.0, 0.0, -1.5, 0.0],
        [0.0, 0.0, 0.0, 1.5],
        [1.5, 0.0, 0.0, 0.0],
    ])
    model = MLPODEF(dims=[d, 8, 1], gl_reg=1e-3)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (512, d))
    v_true = x0 @ A_true.T
    params = model.init(key, jnp.zeros(()), x0)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            v = model.apply(p, 0.0, x0)
            return jnp.mean(jnp.square(v - v_true)) + model.group_lasso_reg(p)

        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, l

    for _ in range(500):
        params, opt_state, l = step(params, opt_state)
    # get_structure[i, j] scores input-gene i -> output-gene j; the dynamics
    # matrix A_true[out, in] transposes that.
    scores = np.asarray(model.get_structure(params)).T
    true_edges = np.abs(np.asarray(A_true)) > 0
    assert scores[true_edges].min() > scores[~true_edges].max(), (
        scores.round(2), true_edges)


def test_ensemble():
    model = MLPODEF(dims=[3, 4, 1])
    init_fn, apply_fn = make_ensemble(model, 5)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (8, 3))
    params = init_fn(key, jnp.zeros(()), x)
    out = apply_fn(params, 0.0, x)
    assert out.shape == (5, 8, 3)
    # Members differ.
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_shd_and_auc():
    true = np.array([[0, 1], [0, 0]])
    est_good = np.array([[0.1, 0.9], [0.2, 0.0]])
    est_bad = 1 - est_good
    m_good = compare_graphs(true, est_good)
    m_bad = compare_graphs(true, est_bad)
    assert m_good["auroc"] > m_bad["auroc"]
    shd, tshd = compare_graphs_bayesian_shd(true, [est_good, est_good])
    assert tshd <= shd + 1e-9
    assert structural_hamming_distance(true, true) == 0.0


def test_shd_deidentified_folding():
    # Row 2 is a duplicate of row 0 (encoded -1 in first column).
    true = np.array([[0, 1, 0], [0, 0, 0], [-1, 0, 0]])
    est = np.array([[0.0, 0.5, 0.0], [0.0, 0.0, 0.0], [0.0, 0.5, 0.0]])
    # Folded row0 = [0, 1, 0] -> SHD 0 against [[0,1,0],[0,0,0]].
    assert structural_hamming_distance(true, est) == pytest.approx(0.0)


def test_emd_translation():
    x = jax.random.normal(jax.random.PRNGKey(3), (256, 2))
    d = float(earth_mover_distance(x, x + jnp.array([3.0, 4.0]), reg=0.01))
    assert abs(d - 5.0) < 0.2, d


def test_growth_interpolation():
    key = jax.random.PRNGKey(4)
    p0 = jnp.zeros((32, 2))
    p1 = jnp.ones((32, 2))
    tmap = jnp.eye(32) / 32
    mid = interpolate_with_ot(key, p0, p1, tmap, 0.5, 64)
    np.testing.assert_allclose(np.asarray(mid), 0.5, atol=1e-6)
    per = interpolate_per_point_with_ot(key, p0, p1, tmap, 0.25)
    np.testing.assert_allclose(np.asarray(per), 0.25, atol=1e-6)
    assert per.shape == (32, 2)


def test_hyper_and_bayes_variants():
    from cfm_tpu.models.grn import BayesMLPODEF, DeepSet, HyperMLPODEF

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (8, 4))

    ds = DeepSet(out_dim=16)
    p = ds.init(key, jnp.zeros((8, 3, 4)))
    ctx = ds.apply(p, jax.random.normal(key, (8, 3, 4)))
    assert ctx.shape == (8, 16)
    # Permutation invariance.
    sets = jax.random.normal(key, (8, 3, 4))
    np.testing.assert_allclose(
        np.asarray(ds.apply(p, sets)),
        np.asarray(ds.apply(p, sets[:, ::-1])),
        rtol=2e-5, atol=1e-5,
    )

    hm = HyperMLPODEF(dims=[4, 8, 1])
    p = hm.init(key, jnp.zeros(()), x, ctx)
    assert hm.apply(p, 0.0, x, ctx).shape == (8, 4)

    bm = BayesMLPODEF(dims=[4, 8, 1])
    p = bm.init(key, jnp.zeros(()), x)
    out_det = bm.apply(p, 0.0, x)
    assert out_det.shape == (8, 4)
    out_s1 = bm.apply(p, 0.0, x, key=jax.random.PRNGKey(1))
    out_s2 = bm.apply(p, 0.0, x, key=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(out_s1), np.asarray(out_s2))
    probs = bm.edge_probs(p)
    assert probs.shape == (4, 4)
    assert bool(jnp.all((probs >= 0) & (probs <= 1)))


def test_dibs_mlpodef_posterior_and_acyclicity():
    """DibsMLPODEF (reference base.py DibsLayer:419-560): reparam-sampled
    forward, latent-Z edge readout with alpha annealing, NOTEARS h(G),
    structure sampling, and KL to the prior."""
    from cfm_tpu.models.grn import DibsMLPODEF

    d, k = 5, 4
    m = DibsMLPODEF(dims=(d, k, 1), rank=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (7, d))
    params = m.init(jax.random.PRNGKey(1), 0.0, x)
    # Deterministic (mean) forward and sampled forward both map (n,d)->(n,d).
    v_mean = m.apply(params, 0.0, x)
    v_s1 = m.apply(params, 0.0, x, key=jax.random.PRNGKey(2))
    v_s2 = m.apply(params, 0.0, x, key=jax.random.PRNGKey(3))
    assert v_mean.shape == (7, d)
    assert not np.allclose(np.asarray(v_s1), np.asarray(v_s2))  # stochastic
    # Edge probabilities anneal toward hard decisions as iter_num grows.
    p1 = m.edge_probs(params, iter_num=1.0)
    p100 = m.edge_probs(params, iter_num=100.0)
    assert p1.shape == (d, d)
    assert float(jnp.mean(jnp.abs(p100 - 0.5))) > float(jnp.mean(jnp.abs(p1 - 0.5)))
    # h_acyclic: zero for an empty graph, positive for a soft cyclic one.
    h = float(m.h_acyclic(params, iter_num=1.0))
    assert h >= 0.0
    zero_params = jax.tree.map(jnp.zeros_like, params)
    # All-zero factors -> p = sigmoid(0) = 0.5 everywhere -> h > 0 (cycles).
    assert float(m.h_acyclic(zero_params, iter_num=1.0)) > 0.0
    # Sampled structures are binary with the right shape.
    S = m.sample_structures(params, jax.random.PRNGKey(4), 6, iter_num=10.0)
    assert S.shape == (6, d, d)
    assert set(np.unique(np.asarray(S))) <= {0.0, 1.0}
    # KL is positive and differentiable.
    kl = float(m.kl_to_prior(params))
    assert kl > 0.0
    g = jax.grad(lambda p: m.kl_to_prior(p))(params)
    assert np.isfinite(
        float(jnp.sum(jnp.abs(g["params"]["w_mean"])))
    )


def test_svgd_update_attracts_and_repulses():
    from cfm_tpu.models.grn import svgd_update

    # 8 particles in 2D; target log p = -||x||^2/2 (standard Gaussian).
    X = {"x": jax.random.normal(jax.random.PRNGKey(0), (8, 2)) * 3.0}
    grads = jax.tree.map(lambda x: -x, X)  # grad log p = -x
    phi = svgd_update(X, grads)
    assert phi["x"].shape == (8, 2)
    # The step must move the particle mean toward the origin (attraction
    # dominates at this spread).
    before = float(jnp.sum(jnp.square(jnp.mean(X["x"], 0))))
    after = float(jnp.sum(jnp.square(jnp.mean(X["x"] + 0.5 * phi["x"], 0))))
    assert after < before
    # With zero gradients, the kernel-repulsion term must push particles
    # apart (posterior particles never collapse).
    Xc = {"x": jnp.zeros((4, 2)).at[:, 0].set(jnp.array([0.0, 0.01, -0.01, 0.02]))}
    phi0 = svgd_update(Xc, jax.tree.map(jnp.zeros_like, Xc))
    spread_before = float(jnp.var(Xc["x"][:, 0]))
    spread_after = float(jnp.var(Xc["x"][:, 0] + 0.1 * phi0["x"][:, 0]))
    assert spread_after > spread_before


def test_bayesian_dist_and_cover_oracle():
    """Hand-computed posterior over a 4-node graph with one deidentified
    duplicate (row 3 aliases variable 0 via the -(v+1) encoding): variable 0
    has out-degree 2 and 1 extra copy, so there are (1+1)^2 = 4 admissible
    edge-to-copy assignments (reference evaluation.py:45-103)."""
    from cfm_tpu.eval.graphs import (
        compare_graph_distribution,
        compare_graphs_bayesian_cover,
        compare_graphs_bayesian_dist,
    )

    true_graph = np.array([
        [0, 1, 1, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 0],
        [-1, 0, 0, 0],   # alias of variable 0
    ])

    def G(row0, row3):
        g = np.zeros((4, 4))
        g[0], g[3] = row0, row3
        g[1] = [0, 0, 1, 0]
        return g

    g_both0 = G([0, 1, 1, 0], [0, 0, 0, 0])     # both edges on the canonical
    g_split = G([0, 1, 0, 0], [0, 0, 1, 0])     # one edge on each copy
    g_both3 = G([0, 0, 0, 0], [0, 1, 1, 0])     # both edges on the alias
    g_wrong = G([0, 1, 0, 0], [0, 0, 0, 0])     # missing an edge

    samples = [g_both0, g_both0, g_split, g_both3, g_wrong]
    seen, total, uniq, adm, cnt = compare_graphs_bayesian_dist(true_graph, samples)
    assert (seen, total, uniq) == (3, 4, 3)
    assert sum(adm.values()) == 4 and sum(cnt.values()) == 5
    assert max(adm.values()) == 2  # g_both0 seen twice
    assert compare_graphs_bayesian_cover(true_graph, samples) == 0.75

    kl_unif, prop, kl_prop = compare_graph_distribution(true_graph, samples)
    np.testing.assert_allclose(kl_unif, np.log2(3) - 1.5, atol=1e-12)
    np.testing.assert_allclose(sorted(prop), [0.2, 0.2, 0.4], atol=1e-12)
    np.testing.assert_allclose(kl_prop, 2.0 - (0.4 * np.log2(2.5) + 0.4 * np.log2(5)), atol=1e-9)

    # No aliases: every exact match is the single admissible graph.
    plain_true = np.maximum(true_graph, 0)[:3, :3]
    plain = [np.asarray(g)[:3, :3] for g in (g_both0, g_wrong)]
    seen, total, uniq, adm, cnt = compare_graphs_bayesian_dist(plain_true, plain)
    assert total == 1 and uniq <= 1


def test_bayesian_diversity_and_sparsity():
    from cfm_tpu.eval.graphs import (
        compute_graphs_bayesian_diversity,
        compute_graphs_sparsity,
    )

    rng = np.random.default_rng(0)
    graphs = rng.binomial(1, 0.5, (64, 6, 6)).astype(float)
    div = compute_graphs_bayesian_diversity(graphs, seed=1)
    assert 0.5 < div < 2.0  # Bernoulli(0.5) posterior ~ unit-normalized
    same = np.repeat(graphs[:1], 64, axis=0)
    assert compute_graphs_bayesian_diversity(same, seed=1) == 0.0
    assert compute_graphs_sparsity(np.zeros((4, 5, 5))) == 1.0
    assert compute_graphs_sparsity(np.ones((4, 5, 5))) == 0.0


def test_compare_graphs_reference_formulas():
    """Parity with evaluation.py:185-255 (review finding r5): a reversed
    edge costs SHD 1 (not 2), and the confusion-matrix metrics match
    hand-computed values."""
    true = np.array([[0, 1], [0, 0]])
    reversed_est = np.array([[0, 0], [1, 0]])       # only the reversed edge
    m = compare_graphs(true, reversed_est)
    assert m["shd"] == 1.0                           # old elementwise SHD said 2
    assert m["tpr"] == 0.0 and m["fdr"] == 1.0
    exact = compare_graphs(true, true.astype(float))
    assert exact["shd"] == 0.0 and exact["tpr"] == 1.0 and exact["f1"] == 1.0
    # Extra + missing still count one each.
    est = np.array([[1, 0], [0, 0]])                 # 1 extra (0,0), 1 missing
    assert compare_graphs(true, est)["shd"] == 2.0
    # Deidentified rows clamp to zero like the reference's np.maximum.
    true_neg = np.array([[0, 1, 0], [0, 0, 0], [-1, 0, 0]])
    m3 = compare_graphs(true_neg, np.zeros((3, 3)))
    assert m3["shd"] == 1.0                          # just the (0,1) edge missing
