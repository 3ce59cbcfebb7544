"""Closed-form Schrödinger-bridge Gaussian oracle.

TPU-native counterpart of the reference's ``DiffusionSchrodingerBridgeGaussians``
datamodule (/root/reference/runner/src/datamodules/distribution_datamodule.py:
284-361): source N(-a 1, I), target N(+a 1, I); the entropic bridge marginal
at time t has the closed form (Mallasto et al. 2020)

    mean_t = (2 a t - a) 1
    cov_t  = (sqrt(4 + sigma^4) t (1 - t) + (1 - t)^2 + t^2) I

The KL of a Gaussian fit of generated samples against this marginal is the
framework's strongest end-to-end correctness metric for SB-CFM/[SF]2M
(logged as ``kl/mean`` by the reference, cfm_module.py:457-470).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def sb_gaussian_marginal(a: float, sigma: float, t, dim: int) -> Tuple[Array, Array]:
    """Closed-form SB marginal (mean vector, isotropic covariance scalar)."""
    t = jnp.asarray(t, jnp.float32)
    mean = (2.0 * a * t - a) * jnp.ones((dim,), jnp.float32)
    var = math.sqrt(4.0 + sigma**4) * t * (1.0 - t) + (1.0 - t) ** 2 + t**2
    return mean, var * jnp.eye(dim, dtype=jnp.float32)


def sample_sb_endpoints(key: Array, n: int, a: float = 0.1, dim: int = 2):
    """(x0, x1) draws from the two endpoint Gaussians."""
    k0, k1 = jax.random.split(key)
    x0 = jax.random.normal(k0, (n, dim)) - a
    x1 = jax.random.normal(k1, (n, dim)) + a
    return x0, x1


def gaussian_kl(mean_p: Array, cov_p: Array, mean_q: Array, cov_q: Array) -> Array:
    """KL( N(mean_p, cov_p) || N(mean_q, cov_q) ), full covariance."""
    d = mean_p.shape[-1]
    cov_q_inv = jnp.linalg.inv(cov_q)
    diff = mean_q - mean_p
    term_trace = jnp.trace(cov_q_inv @ cov_p)
    term_quad = diff @ cov_q_inv @ diff
    _, logdet_p = jnp.linalg.slogdet(cov_p)
    _, logdet_q = jnp.linalg.slogdet(cov_q)
    return 0.5 * (term_trace + term_quad - d + logdet_q - logdet_p)


def sb_marginal_kl(xt: Array, a: float, sigma: float, t) -> Array:
    """KL of the Gaussian fit of ``xt`` against the analytic SB marginal.

    Matches the reference's direction KL(estimated || closed-form)
    (distribution_datamodule.py:356-361).
    """
    est_mean = jnp.mean(xt, axis=0)
    est_cov = jnp.cov(xt.T) if xt.shape[1] > 1 else jnp.var(xt, axis=0)[None, :]
    est_cov = jnp.atleast_2d(est_cov)
    mean, cov = sb_gaussian_marginal(a, sigma, t, xt.shape[1])
    return gaussian_kl(est_mean, est_cov, mean, cov)


def sb_trajectory_kl(
    trajectory: Array, ts: Array, a: float, sigma: float
) -> Array:
    """Mean KL along a rollout: trajectory (T, n, dim) at times ts (T,)."""
    kls = [sb_marginal_kl(trajectory[i], a, sigma, ts[i]) for i in range(ts.shape[0])]
    return jnp.mean(jnp.stack(kls))
