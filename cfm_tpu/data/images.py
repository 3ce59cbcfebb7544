"""Image data pipelines: CIFAR-10 / MNIST loading, augmentation, sharded batching.

TPU-native replacement for the reference's torchvision pipeline
(/root/reference/examples/images/cifar10/train_cifar10.py:69-90:
CIFAR10(train) + RandomHorizontalFlip + ToTensor + Normalize([-1,1]) behind
an infinite DataLoader; DDP variant shards with DistributedSampler,
train_cifar10_ddp.py:84-100). Differences by design:

- **NHWC uint8 in host RAM, normalize on device.** The whole train split
  (50k x 32x32x3 = 150 MB) is one numpy array; each step gathers a batch by
  index, ships uint8 (4x less PCIe/DCN traffic than fp32), and the device
  normalizes to [-1, 1] inside the jitted step.
- **Keyed augmentation.** Horizontal flips are drawn from the training step's
  PRNG key on device (a ``jnp.where`` over a reversed view), not host RNG.
- **Sharding, not samplers.** Per-host batches feed a batch-sharded
  NamedSharding; no DistributedSampler analogue is needed.

File formats read (no torchvision dependency):
- CIFAR-10: the standard "cifar-10-batches-py" pickled batches.
- MNIST: the standard idx-ubyte files (train-images-idx3-ubyte[.gz]).
If no data directory is found, ``synthetic=True`` provides a deterministic
fake set with the same shapes/dtypes so recipes stay runnable end to end.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_CIFAR_DIRS = ("cifar-10-batches-py", "cifar10/cifar-10-batches-py")


def _find(root: str, candidates) -> Optional[str]:
    for c in candidates:
        p = os.path.join(root, c)
        if os.path.exists(p):
            return p
    return None


def load_cifar10(
    data_dir: str = "data", train: bool = True, synthetic: bool = False, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Load CIFAR-10 as (N, 32, 32, 3) uint8 + (N,) int32 labels."""
    if synthetic:
        rng = np.random.default_rng(seed)
        n = 2048
        return (
            rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8),
            rng.integers(0, 10, (n,), dtype=np.int32),
        )
    base = _find(data_dir, _CIFAR_DIRS)
    if base is None:
        raise FileNotFoundError(
            f"CIFAR-10 not found under {data_dir!r} (expected cifar-10-batches-py); "
            "pass synthetic=True for a fake set"
        )
    files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    xs, ys = [], []
    for fname in files:
        with open(os.path.join(base, fname), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(np.asarray(d[b"data"], np.uint8).reshape(-1, 3, 32, 32))
        ys.append(np.asarray(d[b"labels"], np.int32))
    x = np.concatenate(xs).transpose(0, 2, 3, 1)  # NCHW storage -> NHWC
    return np.ascontiguousarray(x), np.concatenate(ys)


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, = struct.unpack(">i", f.read(4))
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "i" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(dims)


def load_mnist(
    data_dir: str = "data", train: bool = True, synthetic: bool = False, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Load MNIST as (N, 28, 28, 1) uint8 + (N,) int32 labels."""
    if synthetic:
        rng = np.random.default_rng(seed)
        n = 2048
        return (
            rng.integers(0, 256, (n, 28, 28, 1), dtype=np.uint8),
            rng.integers(0, 10, (n,), dtype=np.int32),
        )
    prefix = "train" if train else "t10k"
    img = lab = None
    for root, _, names in os.walk(data_dir):
        for name in names:
            if name.startswith(f"{prefix}-images"):
                img = os.path.join(root, name)
            if name.startswith(f"{prefix}-labels"):
                lab = os.path.join(root, name)
    if img is None or lab is None:
        raise FileNotFoundError(
            f"MNIST idx files not found under {data_dir!r}; pass synthetic=True"
        )
    x = _read_idx(img)[..., None]
    y = _read_idx(lab).astype(np.int32)
    return np.ascontiguousarray(x), y


def normalize_images(x_uint8: Array) -> Array:
    """uint8 [0,255] -> float32 [-1, 1] on device (the reference's
    Normalize((0.5,)*3, (0.5,)*3) after ToTensor)."""
    return x_uint8.astype(jnp.float32) / 127.5 - 1.0


def random_hflip(key: Array, x: Array) -> Array:
    """Per-sample horizontal flip with p=0.5, on device, keyed."""
    flip = jax.random.bernoulli(key, 0.5, (x.shape[0],))
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


def infinite_batches(
    data: np.ndarray,
    labels: Optional[np.ndarray],
    batch_size: int,
    seed: int = 0,
) -> Iterator:
    """Host-side infinite shuffled batch iterator (the reference's
    ``infiniteloop``, utils_cifar.py:85-88) yielding uint8 numpy batches."""
    rng = np.random.default_rng(seed)
    n = data.shape[0]
    if batch_size > n:
        raise ValueError(
            f"batch_size {batch_size} exceeds dataset size {n} — the "
            "drop-last batching below would loop forever yielding nothing"
        )
    while True:
        perm = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = perm[start : start + batch_size]
            if labels is None:
                yield data[idx]
            else:
                yield data[idx], labels[idx]
