"""Metric suite tests: W1/W2 oracles, MMD properties, distance aggregation.

Parity model: /root/reference/tests/test_optimal_transport.py:63-91 (wasserstein
vs ground truth) and the metric surface of
runner/src/models/components/distribution_distances.py:19-74.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu.coupling import wasserstein
from cfm_tpu.eval.metrics import (
    compute_distribution_distances,
    linear_mmd2,
    mix_rbf_mmd2,
    poly_mmd2,
)


def test_wasserstein_identical_is_zero():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    assert float(wasserstein(x, x, power=2)) < 1e-3
    assert float(wasserstein(x, x, power=1)) < 1e-3


def test_wasserstein_translation_oracle():
    # W2 between a point cloud and its translation by v is exactly ||v||.
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 2))
    shift = jnp.array([3.0, 4.0])  # norm 5
    w2 = float(wasserstein(x, x + shift, power=2))
    assert abs(w2 - 5.0) < 1e-2, w2
    w1 = float(wasserstein(x, x + shift, power=1))
    assert abs(w1 - 5.0) < 1e-2, w1


def test_wasserstein_matches_scipy_hungarian():
    key0, key1 = jax.random.split(jax.random.PRNGKey(2))
    x0 = jax.random.normal(key0, (32, 4))
    x1 = jax.random.normal(key1, (32, 4)) + 1.0
    w_auction = float(wasserstein(x0, x1, power=2))
    w_hung = float(wasserstein(x0, x1, power=2, solver="hungarian"))
    np.testing.assert_allclose(w_auction, w_hung, rtol=1e-4)


def test_sinkhorn_wasserstein_close_to_exact():
    key0, key1 = jax.random.split(jax.random.PRNGKey(3))
    x0 = jax.random.normal(key0, (64, 2))
    x1 = jax.random.normal(key1, (64, 2)) + 2.0
    w_exact = float(wasserstein(x0, x1, power=2))
    w_sink = float(wasserstein(x0, x1, method="sinkhorn", reg=0.05, power=2))
    assert abs(w_exact - w_sink) / w_exact < 0.25


def test_wasserstein_unknown_method_raises():
    x = jnp.zeros((4, 2))
    with pytest.raises(ValueError):
        wasserstein(x, x, method="emd!")


def test_mmd_zero_for_identical_and_positive_for_shifted():
    x = jax.random.normal(jax.random.PRNGKey(4), (256, 2))
    y = x + 5.0
    assert abs(float(mix_rbf_mmd2(x, x))) < 1e-5
    assert float(mix_rbf_mmd2(x, y)) > 0.1
    assert float(linear_mmd2(x, x)) == 0.0
    assert float(poly_mmd2(x, x)) == 0.0


def test_compute_distribution_distances_shapes():
    key = jax.random.PRNGKey(5)
    pred = jax.random.normal(key, (64, 3, 2))
    true = pred + 0.1
    names, values = compute_distribution_distances(pred, true)
    assert len(names) == len(values)
    # 3 timepoints * 11 names + 11 aggregated
    assert len(names) == 3 * 11 + 11
    assert names[-11] == "1-Wasserstein"


def test_compute_distribution_distances_jagged():
    k = jax.random.PRNGKey(6)
    true = [jax.random.normal(k, (48, 2)), jax.random.normal(k, (32, 2))]
    pred = jax.random.normal(k, (64, 2, 2))
    names, values = compute_distribution_distances(pred, true)
    assert all(not n.endswith("MMD") for n in names)
    assert len(names) == len(values)


def test_distribution_distances_unequal_array_batches():
    """Array inputs with unequal batch sizes must work (review finding r5):
    wasserstein falls back to sinkhorn and the paired-sample MMDs are
    skipped, exactly like the jagged-list path."""
    import numpy as np

    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(100, 2, 3)).astype(np.float32))
    true = jnp.asarray(rng.normal(size=(80, 2, 3)).astype(np.float32))
    names, vals = compute_distribution_distances(pred, true)
    assert len(names) == len(vals)
    assert not any(n.endswith("MMD") for n in names)
    assert all(np.isfinite(v) for v in vals)
