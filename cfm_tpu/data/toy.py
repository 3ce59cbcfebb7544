"""2-D toy distributions, pure JAX (keyed, jittable, device-resident).

Replaces the reference's host-side generators:
- ``eight_normal_sample`` / ``sample_8gaussians`` / ``sample_moons``
  (/root/reference/torchcfm/utils.py:11-38 — 8 gaussians at radius*sqrt(2)
  scale 5, var 0.1; torchdyn moons scaled x3 - 1)
- the DSB-compatible 2-D suite ``data_distrib``
  (/root/reference/runner/src/datamodules/components/two_dim.py:12-104 —
  scurve/swiss/moon/circle/checker/pinwheel/8gaussians/mixture)
- legacy ``sample_data`` generators (generators2d.py:13-183).

Every generator is ``sample(key, n) -> (n, 2)`` — explicit PRNG, no global
state, runs on device so data generation fuses with the train step.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def eight_gaussians(key: Array, n: int, scale: float = 5.0, var: float = 0.1) -> Array:
    """Mixture of 8 unit-circle Gaussians, scaled (torchcfm/utils.py:11-31)."""
    k1, k2 = jax.random.split(key)
    angles = jnp.arange(8) * (2 * math.pi / 8)
    centers = scale * jnp.stack(
        [jnp.sqrt(2.0) * jnp.cos(angles), jnp.sqrt(2.0) * jnp.sin(angles)], axis=-1
    ) / 2.0
    comp = jax.random.randint(k1, (n,), 0, 8)
    noise = jax.random.normal(k2, (n, 2)) * math.sqrt(var)
    return centers[comp] + noise


sample_8gaussians = eight_gaussians


def eight_normal_sample(
    key: Array, n: int, dim: int = 2, scale: float = 1.0, var: float = 1.0
) -> Array:
    """General-dim 8-Gaussians at radius ``scale`` (torchcfm/utils.py:11-31).

    The 8 centers sit on the unit circle (×``scale``) in the first two
    coordinates; remaining dims are pure noise. ``var`` is the component
    variance (std = sqrt(var)); the reference feeds ``sqrt(var)*I`` to
    MultivariateNormal as the *covariance* (std = var**0.25) — an upstream
    quirk not replicated since every quality oracle here is defined against
    this framework's own keyed generators. Kept separate from
    ``eight_gaussians`` (radius scale·√2/2), whose layout the committed
    2-moons W2 band fixtures pin.
    """
    if dim < 2:
        raise ValueError("eight_normal_sample needs dim >= 2")
    k1, k2 = jax.random.split(key)
    angles = jnp.arange(8) * (2 * math.pi / 8)
    centers2d = scale * jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    centers = jnp.zeros((8, dim)).at[:, :2].set(centers2d)
    comp = jax.random.randint(k1, (n,), 0, 8)
    noise = jax.random.normal(k2, (n, dim)) * math.sqrt(var)
    return centers[comp] + noise


def moons(key: Array, n: int, noise: float = 0.05) -> Array:
    """Two interleaved half-moons, unit scale (sklearn make_moons layout)."""
    k1, k2, k3 = jax.random.split(key, 3)
    upper = jax.random.bernoulli(k1, 0.5, (n,))
    theta = jax.random.uniform(k2, (n,), minval=0.0, maxval=math.pi)
    x = jnp.where(upper, jnp.cos(theta), 1.0 - jnp.cos(theta))
    y = jnp.where(upper, jnp.sin(theta), 0.5 - jnp.sin(theta))
    pts = jnp.stack([x, y], axis=-1)
    return pts + noise * jax.random.normal(k3, (n, 2))


def sample_moons(key: Array, n: int, noise: float = 0.2) -> Array:
    """Reference scaling: moons * 3 - 1 (torchcfm/utils.py:34-38).

    Noise calibration note: ``noise`` here is the OUTPUT-space gaussian std
    (0.2 default). torchcfm feeds torchdyn ``generate_moons(noise=0.2)`` at
    UNIT scale before the x3, i.e. output std 0.6; the committed W2 band
    oracle (tools/gen_moons_band.py) uses unit-scale 0.1 -> output 0.3.
    Both deviations are pinned by the committed band fixtures/tables (like
    the ``eight_gaussians`` radius note above) — regenerating the band and
    this default together is the path to strict torchcfm noise parity.
    """
    return moons(key, n, noise=noise / 3.0) * 3.0 - 1.0


def pinwheel(key: Array, n: int, n_arms: int = 5) -> Array:
    """Pinwheel of rotated Gaussian blades (two_dim.py:50-68 pinwheel —
    radial/tangential stds 0.3/0.1, rate 0.25, row-vector rotation f @ R
    [the arms curl clockwise; a column-vector rotation mirrors them],
    scale 7.5)."""
    k1, k2 = jax.random.split(key)
    rate = 0.25
    arm = jax.random.randint(k1, (n,), 0, n_arms)
    feats = jax.random.normal(k2, (n, 2)) * jnp.array([0.3, 0.1]) + jnp.array([1.0, 0.0])
    angles = arm * (2 * math.pi / n_arms) + rate * jnp.exp(feats[:, 0])
    c, s = jnp.cos(angles), jnp.sin(angles)
    x = c * feats[:, 0] + s * feats[:, 1]
    y = -s * feats[:, 0] + c * feats[:, 1]
    return 7.5 * jnp.stack([x, y], axis=-1)


def checkerboard(key: Array, n: int, scale: float = 4.0) -> Array:
    """Checkerboard density on [-scale, scale]^2 (generators2d.py checkerboard)."""
    k1, k2, k3 = jax.random.split(key, 3)
    x1 = jax.random.uniform(k1, (n,)) * scale - scale / 2
    x2_ = jax.random.uniform(k2, (n,)) - jax.random.randint(k3, (n,), 0, 2) * 2
    x2 = x2_ + jnp.floor(x1) % 2
    return jnp.stack([x1, x2], axis=-1) * 2.0


def circles(key: Array, n: int, noise: float = 0.08) -> Array:
    """Two concentric circles (sklearn make_circles layout, scaled x3)."""
    k1, k2, k3 = jax.random.split(key, 3)
    inner = jax.random.bernoulli(k1, 0.5, (n,))
    r = jnp.where(inner, 0.5, 1.0)
    theta = jax.random.uniform(k2, (n,), minval=0.0, maxval=2 * math.pi)
    pts = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
    return 3.0 * (pts + noise * jax.random.normal(k3, (n, 2)))


def spirals(key: Array, n: int) -> Array:
    """Two interleaved Archimedean spirals (generators2d.py 2spirals)."""
    k1, k2, k3 = jax.random.split(key, 3)
    t = jnp.sqrt(jax.random.uniform(k1, (n,))) * 540 * (2 * math.pi) / 360
    sign = jnp.where(jax.random.bernoulli(k2, 0.5, (n,)), 1.0, -1.0)
    dx = -jnp.cos(t) * t / (3 * math.pi)
    dy = jnp.sin(t) * t / (3 * math.pi)
    pts = jnp.stack([sign * dx, sign * dy], axis=-1) * 3.0
    return pts + 0.1 * jax.random.normal(k3, (n, 2))


def swissroll(key: Array, n: int, noise: float = 0.05) -> Array:
    """2-D projection of the swiss roll (two_dim.py swiss scaling /5 * 2)."""
    k1, k2 = jax.random.split(key)
    t = 1.5 * math.pi * (1 + 2 * jax.random.uniform(k1, (n,)))
    pts = jnp.stack([t * jnp.cos(t), t * jnp.sin(t)], axis=-1) / 5.0
    return pts + noise * jax.random.normal(k2, (n, 2))


def scurve(key: Array, n: int, noise: float = 0.05) -> Array:
    """2-D S-curve (two_dim.py scurve: (x, z) of sklearn make_s_curve)."""
    k1, k2 = jax.random.split(key)
    t = 3 * math.pi * (jax.random.uniform(k1, (n,)) - 0.5)
    x = jnp.sin(t)
    z = jnp.sign(t) * (jnp.cos(t) - 1.0)
    pts = jnp.stack([x, z], axis=-1)
    return 2.0 * (pts + noise * jax.random.normal(k2, (n, 2)))


def gaussian_mixture(
    key: Array, n: int, means: Array | None = None, var: float = 0.1
) -> Array:
    """Generic isotropic Gaussian mixture with uniform weights."""
    if means is None:
        means = jnp.array([[-2.0, 0.0], [2.0, 0.0]])
    k1, k2 = jax.random.split(key)
    comp = jax.random.randint(k1, (n,), 0, means.shape[0])
    return means[comp] + math.sqrt(var) * jax.random.normal(k2, (n, 2))


def gaussian(key: Array, n: int, std: float = 1.0, dim: int = 2) -> Array:
    return std * jax.random.normal(key, (n, dim))


def funnel(key: Array, n: int, dim: int = 10) -> Array:
    """Neal's funnel: x0 ~ N(0,1), x_{1:} ~ N(0, exp(x0)) — the reference's
    d-dimensional CNF test target (distribution_datamodule.py:488-491,
    configs/datamodule/funnel.yaml: dim 10)."""
    x = jax.random.normal(key, (n, dim))
    return x.at[:, 1:].multiply(jnp.exp(x[:, :1] / 2.0))


_REGISTRY: Dict[str, Callable[[Array, int], Array]] = {
    "8gaussians": eight_gaussians,
    "moons": sample_moons,
    "moon": sample_moons,
    "pinwheel": pinwheel,
    "checkerboard": checkerboard,
    "checker": checkerboard,
    "circles": circles,
    "circle": circles,
    "2spirals": spirals,
    "swiss": swissroll,
    "swissroll": swissroll,
    "scurve": scurve,
    "mixture": gaussian_mixture,
    "gaussian": gaussian,
    "funnel": funnel,
}

# Generators that take a ``dim`` keyword (the rest are intrinsically 2-D).
_DIM_AWARE = {"gaussian", "funnel"}


def two_dim_data(name: str, dim: int = 0) -> Callable[[Array, int], Array]:
    """Look up a generator by name (parity with two_dim.py ``data_distrib``).

    ``dim`` > 0 pins the sample dimensionality for dimension-aware
    generators (``funnel``/``gaussian`` — the reference's TorchDynDataModule
    ``system_kwargs: {dim: 10}``, configs/datamodule/funnel.yaml); 2-D-only
    generators reject any other value rather than silently ignoring it.
    """
    try:
        gen = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unknown 2D dataset: {name!r}; have {sorted(_REGISTRY)}")
    if dim and name in _DIM_AWARE:
        return lambda key, n, _g=gen, _d=dim: _g(key, n, dim=_d)
    if dim and dim != 2:
        raise ValueError(f"{name!r} is a 2-D generator; got dim={dim}")
    return gen


def blobs(key: Array, n: int, n_centers: int = 3, std: float = 0.5) -> Array:
    """Isotropic Gaussian blobs (sklearn make_blobs role, SKLearnDataModule)."""
    k_c, k_comp, k_n = jax.random.split(key, 3)
    centers = 4.0 * jax.random.normal(jax.random.PRNGKey(7), (n_centers, 2))
    comp = jax.random.randint(k_comp, (n,), 0, n_centers)
    return centers[comp] + std * jax.random.normal(k_n, (n, 2))


_REGISTRY["blobs"] = blobs
