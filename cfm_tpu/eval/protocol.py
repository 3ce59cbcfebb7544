"""The FID evaluation protocol pieces shared by examples and tests.

Mirrors the reference's CIFAR-10 FID recipe (/root/reference/examples/images/
cifar10/compute_fid.py): generate 50k samples with dopri5 (tol 1e-5) or
euler-100, quantize to uint8 with x*127.5+128 (:90), extract InceptionV3
features in clean-fid ``legacy_tensorflow`` mode (:95-103), Frechet distance
against the CIFAR-10 train split statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_to_uint8(x: Array) -> Array:
    """Generated [-1, 1] images -> uint8, the reference's exact formula
    (compute_fid.py:90): x * 127.5 + 128, clipped to [0, 255]."""
    return jnp.clip(x * 127.5 + 128.0, 0.0, 255.0).astype(jnp.uint8)
