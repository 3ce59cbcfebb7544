"""FID statistics and feature-network tests.

Oracle: the closed-form Frechet distance between Gaussians; the reference's
pipeline (pytorch-fid/clean-fid) is validated against the same formula.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu.eval.fid import (
    compute_fid,
    compute_statistics,
    fid_from_features,
    frechet_distance,
    make_tracking_feature_fn,
)


def test_frechet_distance_closed_form():
    """For isotropic Gaussians: d^2 = ||mu1-mu2||^2 + (sqrt(v1)-sqrt(v2))^2 * d."""
    d = 4
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    s1, s2 = np.eye(d) * 1.0, np.eye(d) * 4.0
    expected = 4.0 * d + (1.0 - 2.0) ** 2 * d
    assert abs(frechet_distance(mu1, s1, mu2, s2) - expected) < 1e-6


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 16))
    mu, s = compute_statistics(feats)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-8


def test_fid_orders_distributions():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2000, 8))
    near = rng.normal(loc=0.1, size=(2000, 8))
    far = rng.normal(loc=3.0, size=(2000, 8))
    assert fid_from_features(a, near) < fid_from_features(a, far)


def test_tracking_features_deterministic_and_monotone():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, (256, 32, 32, 3), np.uint8)
    darker = (base * 0.5).astype(np.uint8)
    f1 = make_tracking_feature_fn((32, 32, 3), seed=0)
    f2 = make_tracking_feature_fn((32, 32, 3), seed=0)
    a = np.asarray(f1(jnp.asarray(base[:8])))
    b = np.asarray(f2(jnp.asarray(base[:8])))
    np.testing.assert_array_equal(a, b)
    fid_same = compute_fid(f1, base, base.copy(), batch_size=128)
    fid_diff = compute_fid(f1, base, darker, batch_size=128)
    assert fid_same < 1e-6
    assert fid_diff > fid_same


def test_inception_trunk_shape_and_param_count():
    from cfm_tpu.eval.inception import InceptionV3Features

    m = InceptionV3Features()
    x = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 2048)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    # The InceptionV3 feature trunk is ~21.8M parameters (conv+bn, no fc).
    assert 21_000_000 < n_params < 23_000_000, n_params


def test_inception_weight_port_roundtrip(tmp_path):
    """port_torch_inception_weights -> load_inception_params preserves values
    and produces the module's exact param tree."""
    from cfm_tpu.eval.inception import (
        InceptionV3Features,
        load_inception_params,
        port_torch_inception_weights,
    )

    m = InceptionV3Features()
    x = jnp.zeros((1, 32, 32, 3), jnp.uint8)
    params = m.init(jax.random.PRNGKey(0), x)

    # Build a fake torch-style state dict from the flax tree, then port back.
    state_dict = {}

    def walk(node, prefix):
        for k, v in node.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                if k == "conv":
                    state_dict[f"{prefix}.conv.weight"] = np.asarray(v["kernel"]).transpose(3, 2, 0, 1)
                else:
                    walk(v, name)
            elif k == "bn_scale":
                state_dict[f"{prefix}.bn.weight"] = np.asarray(v)
            elif k == "bn_bias":
                state_dict[f"{prefix}.bn.bias"] = np.asarray(v)
            elif k == "bn_mean":
                state_dict[f"{prefix}.bn.running_mean"] = np.asarray(v)
            elif k == "bn_var":
                state_dict[f"{prefix}.bn.running_var"] = np.asarray(v)

    walk(params["params"], "")
    npz = str(tmp_path / "inception.npz")
    port_torch_inception_weights(state_dict, npz)
    restored = load_inception_params(npz)

    flat_orig = jax.tree_util.tree_leaves_with_path(params["params"])
    flat_rest = jax.tree_util.tree_leaves_with_path(restored["params"])
    assert len(flat_orig) == len(flat_rest)
    orig_map = {jax.tree_util.keystr(k): v for k, v in flat_orig}
    for k, v in flat_rest:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(orig_map[jax.tree_util.keystr(k)]))
    # And the module accepts the restored tree.
    out = m.apply(restored, x)
    assert out.shape == (1, 2048)
