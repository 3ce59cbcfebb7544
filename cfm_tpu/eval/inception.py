"""InceptionV3 (pytorch-fid variant) feature trunk in flax, NHWC.

Faithful re-implementation of the InceptionV3 network used by the reference's
FID evaluators (pytorch-fid / clean-fid, /root/reference/examples/images/
cifar10/compute_fid.py:95-103): the torchvision InceptionV3 trunk up to the
pool3 (2048-d) features, with pytorch-fid's modifications — average pools
with ``count_include_pad=False`` in the A/C/E blocks and a max pool in the
final E block (FIDInceptionE_2).

Eval-only: BatchNorm is folded to affine inference form, so every layer is a
pure function of (params, x). Weights come from a ported ``.npz`` (see
``port_torch_inception_weights``); the architecture is validated
shape-by-shape against the pytorch-fid state dict during porting.

Input: uint8 NHWC images of any HxW; preprocessing resizes to 299x299
bilinear (half-pixel centers = torch ``align_corners=False``) and scales to
[-1, 1], matching pytorch-fid ``normalize_input=True``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_BN_EPS = 1e-3


def tf1_resize_bilinear(x: Array, out_h: int, out_w: int) -> Array:
    """TF1 ``tf.image.resize_bilinear(align_corners=False)`` in JAX, NHWC.

    The clean-fid ``legacy_tensorflow`` FID mode (the reference's actual
    evaluation mode, /root/reference/examples/images/cifar10/
    compute_fid.py:95-103) resizes with the ORIGINAL TF1 kernel: source
    coordinate = dest * (in/out) with NO half-pixel-center shift — different
    from torch/jax ``align_corners=False`` bilinear (which uses
    (dest+0.5)*scale-0.5). FID values are sensitive to this; bit-parity
    against ``tf.compat.v1.image.resize_bilinear`` is pinned in
    tests/test_fid.py.
    """
    n, in_h, in_w, c = x.shape
    x = x.astype(jnp.float32)

    def axis_coords(in_size, out_size):
        scale = in_size / out_size
        src = jnp.arange(out_size, dtype=jnp.float32) * scale
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = src - lo.astype(jnp.float32)
        return lo, hi, frac

    lo_h, hi_h, fh = axis_coords(in_h, out_h)
    lo_w, hi_w, fw = axis_coords(in_w, out_w)
    top = jnp.take(x, lo_h, axis=1)
    bot = jnp.take(x, hi_h, axis=1)
    rows = top + (bot - top) * fh[None, :, None, None]
    left = jnp.take(rows, lo_w, axis=2)
    right = jnp.take(rows, hi_w, axis=2)
    return left + (right - left) * fw[None, None, :, None]


def _avg_pool_nocountpad(x: Array, window: int = 3) -> Array:
    """3x3 stride-1 avg pool, SAME padding, count_include_pad=False."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    return sums / counts


def _max_pool(x: Array, window: int = 3, stride: int = 2, padding: str = "VALID") -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), padding
    )


class BasicConv2d(nn.Module):
    """Conv (no bias) + folded BatchNorm + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        x = (x - mean) * scale * jax.lax.rsqrt(var + _BN_EPS) + bias
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=[(2, 2), (2, 2)], name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocountpad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocountpad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # "avg" (Mixed_7b / FIDInceptionE_1) | "max" (Mixed_7c / E_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=[(1, 1), (1, 1)], name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool_nocountpad(x)
        else:
            bp = _max_pool(x, window=3, stride=1, padding="SAME")
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """uint8 NHWC -> (N, 2048) pool3 features.

    ``mode`` selects the FID preprocessing convention (same trunk weights —
    pytorch-fid's checkpoint IS the ported 2015-12-05 TF graph weights):

    - "pytorch_fid": /255, torch-style half-pixel bilinear resize to 299,
      then 2x-1 (normalize_input=True) — the runner's FID
      (reference cfm_module.py:474-483).
    - "legacy_tensorflow": TF1 resize_bilinear(align_corners=False) on raw
      0..255 values, then (x-128)/128 — clean-fid's legacy mode, the
      reference's headline FID protocol (compute_fid.py:95-103). The two
      modes give systematically different FIDs; published numbers are
      comparable only within a mode.
    """

    mode: str = "pytorch_fid"

    @nn.compact
    def __call__(self, x_uint8: Array) -> Array:
        n = x_uint8.shape[0]
        if self.mode == "legacy_tensorflow":
            x = tf1_resize_bilinear(x_uint8.astype(jnp.float32), 299, 299)
            x = (x - 128.0) / 128.0
        elif self.mode == "pytorch_fid":
            x = x_uint8.astype(jnp.float32) / 255.0
            x = jax.image.resize(x, (n, 299, 299, x.shape[-1]), method="bilinear")
            x = 2.0 * x - 1.0  # normalize_input=True
        else:
            raise ValueError(f"Unknown FID mode: {self.mode}")
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=[(1, 1), (1, 1)], name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)


# --------------------------------------------------------------------------
# Weight porting / loading
# --------------------------------------------------------------------------


def port_torch_inception_weights(state_dict: Dict[str, Any], npz_path: str) -> None:
    """Convert a pytorch-fid InceptionV3 state dict into our npz layout.

    ``state_dict`` maps names like ``Mixed_5b.branch1x1.conv.weight`` (OIHW)
    and ``...bn.{weight,bias,running_mean,running_var}``. Offline one-time
    step (the zero-egress training image cannot download the checkpoint).
    """
    out = {}
    for name, tensor in state_dict.items():
        if name.startswith(("AuxLogits", "fc.")):
            # Real checkpoint carries the classifier head + aux tower; the
            # pool3 feature trunk (all FID protocols use) does not.
            continue
        t = np.asarray(tensor)
        if name.endswith(".conv.weight"):
            key = name[: -len(".conv.weight")]
            out[f"{key}/conv/kernel"] = t.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif name.endswith(".bn.weight"):
            out[name[: -len(".bn.weight")] + "/bn_scale"] = t
        elif name.endswith(".bn.bias"):
            out[name[: -len(".bn.bias")] + "/bn_bias"] = t
        elif name.endswith(".bn.running_mean"):
            out[name[: -len(".bn.running_mean")] + "/bn_mean"] = t
        elif name.endswith(".bn.running_var"):
            out[name[: -len(".bn.running_var")] + "/bn_var"] = t
        # fc / AuxLogits weights are not part of the feature trunk.
    np.savez(npz_path, **out)


def load_inception_params(npz_path: str) -> Dict[str, Any]:
    """Load ported npz into the flax params pytree for InceptionV3Features."""
    raw = np.load(npz_path)
    params: Dict[str, Any] = {}
    for flat_key, value in raw.items():
        parts = flat_key.replace(".", "/").split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return {"params": params}
