"""FID: Frechet Inception Distance — statistics machinery + feature networks.

TPU-native counterpart of the reference's FID path (clean-fid
``mode="legacy_tensorflow"`` at /root/reference/examples/images/cifar10/
compute_fid.py:95-103 and pytorch-fid at runner/src/models/cfm_module.py:
474-483). Three layers:

1. **Statistics** — ``compute_statistics`` (mu, covariance over features) and
   ``frechet_distance`` (the exact Frechet/Wasserstein-2 formula with a
   host-side matrix sqrt) — identical math to both reference backends.
2. **InceptionV3 feature network** — the torchvision/pytorch-fid InceptionV3
   trunk (pool3, 2048-d) in flax, NHWC. Weights load from a local ``.npz``
   (``CFM_TPU_INCEPTION_WEIGHTS`` env var or explicit path; zero-egress
   images can't download the 2015-12-05 checkpoint, so porting is a one-time
   offline step via ``port_torch_inception_weights``).
3. **Tracking features** — a fixed-seed random conv feature extractor usable
   with the same statistics machinery when no Inception weights are present.
   Its "FID" is NOT comparable to published numbers but is monotone in
   distribution mismatch, so it tracks training progress.

The 50k-sample protocol of the reference (dopri5 tol 1e-5, uint8 quantization
x*127.5+128, train split reference statistics) lives in
``examples/compute_fid.py``.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# --------------------------------------------------------------------------
# Statistics
# --------------------------------------------------------------------------


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Feature mean and covariance — the (mu, sigma) of the FID formula."""
    feats = np.asarray(features, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """||mu1 - mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)).

    Matrix sqrt on host via scipy (eval-time only, identical to pytorch-fid's
    ``calculate_frechet_distance``), with the same eps jitter fallback for
    near-singular covariances.
    """
    import scipy.linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if isinstance(covmean, tuple):  # older scipy returned (sqrtm, errest)
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
        if isinstance(covmean, tuple):
            covmean = covmean[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(gen_feats: np.ndarray, ref_feats: np.ndarray) -> float:
    mu1, s1 = compute_statistics(gen_feats)
    mu2, s2 = compute_statistics(ref_feats)
    return frechet_distance(mu1, s1, mu2, s2)


def batched_features(
    feature_fn: Callable[[Array], Array], images: np.ndarray, batch_size: int = 256
) -> np.ndarray:
    """Run a jitted feature fn over uint8 NHWC images in batches."""
    feats = []
    n = images.shape[0]
    fn = jax.jit(feature_fn)
    for i in range(0, n, batch_size):
        batch = jnp.asarray(images[i : i + batch_size])
        feats.append(np.asarray(fn(batch)))
    return np.concatenate(feats, axis=0)


def compute_fid(
    feature_fn: Callable[[Array], Array],
    gen_images: np.ndarray,
    ref_images: np.ndarray,
    batch_size: int = 256,
) -> float:
    """End-to-end FID between two uint8 image sets under a feature net."""
    g = batched_features(feature_fn, gen_images, batch_size)
    r = batched_features(feature_fn, ref_images, batch_size)
    return fid_from_features(g, r)


# --------------------------------------------------------------------------
# Feature networks
# --------------------------------------------------------------------------


def make_tracking_feature_fn(
    image_shape: Tuple[int, int, int], feature_dim: int = 256, seed: int = 0
) -> Callable[[Array], Array]:
    """Fixed random conv features for progress tracking without weights.

    Three stride-2 conv+relu stages with frozen N(0, 2/fan_in) kernels, then
    global mean pool and a fixed projection. Deterministic in ``seed``.
    """
    h, w, c = image_shape
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    chans = [c, 32, 64, 128]
    kernels = []
    for i in range(3):
        fan_in = 3 * 3 * chans[i]
        kernels.append(
            jax.random.normal(ks[i], (3, 3, chans[i], chans[i + 1])) * np.sqrt(2.0 / fan_in)
        )
    proj = jax.random.normal(ks[3], (chans[-1], feature_dim)) / np.sqrt(chans[-1])

    def features(x_uint8: Array) -> Array:
        x = x_uint8.astype(jnp.float32) / 127.5 - 1.0
        for k in kernels:
            x = jax.lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x)
        pooled = jnp.mean(x, axis=(1, 2))
        return pooled @ proj

    return features


def inception_feature_fn(
    weights_path: Optional[str] = None, mode: str = "legacy_tensorflow"
) -> Callable[[Array], Array]:
    """InceptionV3 pool3 feature fn (2048-d), NHWC uint8 in.

    ``mode``: "legacy_tensorflow" (clean-fid legacy — the reference's
    headline FID protocol, compute_fid.py:95-103; default) or "pytorch_fid"
    (the runner's FID, cfm_module.py:474-483). Same trunk weights either way.
    Requires ported weights (npz). Raises with guidance if unavailable.
    """
    from .inception import InceptionV3Features, load_inception_params

    weights_path = weights_path or os.environ.get("CFM_TPU_INCEPTION_WEIGHTS")
    if not weights_path or not os.path.exists(weights_path):
        raise FileNotFoundError(
            "InceptionV3 FID weights not found. Port them offline with "
            "cfm_tpu.eval.inception.port_torch_inception_weights(pt_path, npz_path) "
            "and set CFM_TPU_INCEPTION_WEIGHTS=<npz_path>. For weight-free "
            "progress tracking use make_tracking_feature_fn instead."
        )
    model = InceptionV3Features(mode=mode)
    params = load_inception_params(weights_path)

    def features(x_uint8: Array) -> Array:
        return model.apply(params, x_uint8)

    return features
