"""FID statistics and feature-network tests.

Oracle: the closed-form Frechet distance between Gaussians; the reference's
pipeline (pytorch-fid/clean-fid) is validated against the same formula.
"""

import os
import re

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


def test_tf1_resize_bilinear_matches_tensorflow():
    """Bit-parity of the legacy-TF resize against actual TF (in this image).

    clean-fid's legacy_tensorflow FID (the reference's headline protocol,
    compute_fid.py:95-103) hinges on TF1 resize semantics — src = dst*scale,
    no half-pixel shift. Skipped where tensorflow isn't installed."""
    tf = pytest.importorskip("tensorflow")
    from cfm_tpu.eval.inception import tf1_resize_bilinear

    rng = np.random.default_rng(0)
    for (h, w, oh, ow) in [(32, 32, 299, 299), (28, 28, 299, 299)]:
        x = rng.integers(0, 256, (2, h, w, 3)).astype(np.float32)
        ours = np.asarray(tf1_resize_bilinear(jnp.asarray(x), oh, ow))
        theirs = tf.compat.v1.image.resize_bilinear(
            tf.constant(x), (oh, ow), align_corners=False
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_pytorch_fid_resize_matches_torch():
    """jax.image.resize bilinear (half-pixel) == torch F.interpolate
    align_corners=False — the pytorch-fid preprocessing (cfm_module.py:474-483)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(
        jax.image.resize(jnp.asarray(x), (2, 299, 299, 3), method="bilinear")
    )
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=(299, 299),
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_fid_uint8_quantization_protocol():
    """The generation->uint8 step of the FID protocol: x*127.5+128, clipped
    (reference compute_fid.py:90). Pinned on exact grid values."""
    from cfm_tpu.eval.protocol import quantize_to_uint8

    x = jnp.asarray([-1.0, -0.5, 0.0, 0.5, 1.0, -1.2, 1.2])
    q = np.asarray(quantize_to_uint8(x))
    np.testing.assert_array_equal(q, np.asarray([0, 64, 128, 191, 255, 0, 255], np.uint8))


def test_legacy_vs_pytorch_fid_modes_differ():
    """The two preprocessing modes must NOT be interchangeable — different
    resize + normalization give different features for the same weights."""
    from cfm_tpu.eval.inception import InceptionV3Features

    x = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (2, 32, 32, 3)), jnp.uint8
    )
    key = jax.random.PRNGKey(0)
    params = InceptionV3Features(mode="pytorch_fid").init(key, x[:1])
    f_pt = InceptionV3Features(mode="pytorch_fid").apply(params, x)
    f_tf = InceptionV3Features(mode="legacy_tensorflow").apply(params, x)
    assert f_pt.shape == (2, 2048) and f_tf.shape == (2, 2048)
    # Random-init features attenuate input deltas; the preprocessing itself
    # must differ decisively (TF1 vs half-pixel resize grid + /128 vs /127.5).
    assert float(jnp.max(jnp.abs(f_pt - f_tf))) > 0
    from cfm_tpu.eval.inception import tf1_resize_bilinear

    xf = x.astype(jnp.float32)
    r_tf = tf1_resize_bilinear(xf, 299, 299)
    r_pt = jax.image.resize(xf, (2, 299, 299, 3), method="bilinear")
    assert float(jnp.max(jnp.abs(r_tf - r_pt))) > 1.0


def test_inception_trunk_parity_vs_torch_mirror():
    """The flax trunk and an independent torch implementation produce the
    same 2048-d features from IDENTICAL (random) weights — pinning conv
    layout, padding, folded-BN and pooling conventions of the port without
    the real checkpoint. 299x299 input isolates the trunk (resize is a
    no-op; preprocessing parity is tested separately)."""
    torch = pytest.importorskip("torch")
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
    from torch_inception_mirror import TorchInceptionTrunk, load_flax_params

    from cfm_tpu.eval.inception import InceptionV3Features

    rng = np.random.default_rng(3)
    x_uint8 = rng.integers(0, 256, (2, 299, 299, 3)).astype(np.uint8)

    model = InceptionV3Features(mode="pytorch_fid")
    params = model.init(jax.random.PRNGKey(7), jnp.asarray(x_uint8[:1]))
    # Randomize the folded-BN buffers too (init leaves mean=0/var=1).
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    for k in list(flat):
        if k[-1] in ("bn_mean", "bn_bias"):
            flat[k] = jnp.asarray(rng.normal(0, 0.1, flat[k].shape), jnp.float32)
        elif k[-1] == "bn_var":
            flat[k] = jnp.asarray(rng.uniform(0.5, 1.5, flat[k].shape), jnp.float32)
    params = {"params": flax.traverse_util.unflatten_dict(flat)}

    feats_jax = np.asarray(model.apply(params, jnp.asarray(x_uint8)))

    mirror = TorchInceptionTrunk().eval()
    load_flax_params(mirror, params)
    xn = torch.from_numpy(x_uint8.astype(np.float32) / 255.0 * 2.0 - 1.0).permute(
        0, 3, 1, 2
    )
    with torch.no_grad():
        feats_torch = mirror(xn).numpy()

    assert feats_jax.shape == feats_torch.shape == (2, 2048)
    np.testing.assert_allclose(feats_jax, feats_torch, atol=1e-4)


# ---------------------------------------------------------------------------
# Dress rehearsal of the zero-decision real-FID one-shot (tools/fid_real.sh)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_fid_real_one_shot_rehearsal(tmp_path):
    """Run tools/fid_real.sh END-TO-END with random weights in the real
    checkpoint's nomenclature and synthetic data: .pth -> ported npz ->
    tiny-ckpt generation -> legacy-TF preprocessing -> Inception features ->
    FID scalar. When the real assets arrive, the identical command (minus
    FID_REHEARSAL_ARGS) produces the number vs the reference's 3.5
    (compute_fid.py:30-109). Asserts plumbing, not the value."""
    import subprocess
    import sys as _sys

    import torch

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
    from torch_inception_mirror import TorchInceptionTrunk, to_pytorch_fid_state_dict

    torch.manual_seed(0)
    pth = tmp_path / "pt_inception-rehearsal.pth"
    torch.save(to_pytorch_fid_state_dict(TorchInceptionTrunk()), pth)

    out_dir = tmp_path / "results"
    tiny = [
        "--override", "model.num_channels=32",
        "--override", "model.channel_mult=(1,2)",
        "--override", "model.num_res_blocks=1",
    ]
    env = {"PATH": "/usr/bin:/bin", "PYTHONPATH": "", "HOME": "/root",
           "JAX_PLATFORMS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    r = subprocess.run(
        [_sys.executable, "/root/repo/examples/train_cifar10.py",
         "--model", "otcfm", "--synthetic", "--total_steps", "6",
         "--batch_size", "16", "--save_step", "5",
         "--output_dir", str(out_dir), "--no_bf16"] + tiny,
        cwd="/tmp", timeout=420, capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]

    rehearsal_args = " ".join(
        ["--synthetic", "--num_gen", "16", "--num_ref", "128",
         "--batch_size_fid", "16", "--integration_method", "euler",
         "--integration_steps", "4", "--output_dir", str(out_dir)]
        + tiny)
    r = subprocess.run(
        ["bash", "/root/repo/tools/fid_real.sh", str(pth),
         str(tmp_path / "no_real_data"), "otcfm"],
        cwd="/tmp", timeout=420, capture_output=True, text=True,
        env={**env, "FID_REHEARSAL_ARGS": rehearsal_args,
             "PYTHON": _sys.executable},
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "feature network: inception[legacy_tensorflow]" in r.stdout, r.stdout[-2000:]
    m = re.search(r"FID\[inception\[legacy_tensorflow\]\] = ([0-9.]+)", r.stdout)
    assert m, r.stdout[-2000:]
    assert np.isfinite(float(m.group(1)))
    # Idempotence: the ported npz is reused on a second invocation.
    assert (tmp_path / "pt_inception-rehearsal.ported.npz").exists()
