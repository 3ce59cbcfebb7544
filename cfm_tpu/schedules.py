"""Reference-process noise schedules for bridges and [SF]2M.

TPU-native counterpart of /root/reference/runner/src/models/components/
schedule.py:5-73. A scheduler defines g(t) (the reference SDE's diffusion
coefficient) and F(t) = \\int_0^t g(s)^2 ds; the Brownian-bridge marginal std
used by the SF2M modules is  sigma_t = sqrt(F(t) - F(t)^2 / F(1))
(cfm_module.py:834-850). All pure jnp — usable inside jitted losses/solvers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


class NoiseScheduler:
    """Base: subclasses define g(t) and F(t)."""

    def g(self, t: Array) -> Array:
        raise NotImplementedError

    def F(self, t: Array) -> Array:
        raise NotImplementedError

    def bridge_sigma_t(self, t: Array) -> Array:
        """Brownian-bridge std sqrt(F(t) - F(t)^2 / F(1))."""
        F_t = self.F(t)
        F_1 = self.F(jnp.asarray(1.0))
        return jnp.sqrt(jnp.maximum(F_t - F_t**2 / F_1, 0.0))

    def bridge_sigma_t_prime_over_sigma_t(self, t: Array, eps: float = 1e-8) -> Array:
        """d/dt log sigma_t for the bridge — the drift scaling of SB paths."""
        F_t = self.F(t)
        F_1 = self.F(jnp.asarray(1.0))
        g2 = self.g(t) ** 2
        num = g2 * (1.0 - 2.0 * F_t / F_1)
        den = 2.0 * jnp.maximum(F_t - F_t**2 / F_1, eps)
        return num / den


class ConstantNoiseScheduler(NoiseScheduler):
    """g(t) = sigma, F(t) = sigma^2 t (schedule.py ConstantNoiseScheduler).

    Its bridge std is sigma*sqrt(t(1-t)) — exactly the SB-CFM path."""

    def __init__(self, sigma: float):
        self.sigma = sigma

    def g(self, t):
        return self.sigma * jnp.ones_like(jnp.asarray(t, jnp.float32))

    def F(self, t):
        return self.sigma**2 * jnp.asarray(t, jnp.float32)


class LinearDecreasingNoiseScheduler(NoiseScheduler):
    """g(t)^2 decreasing linearly from sigma_max^2 to sigma_min^2."""

    def __init__(self, sigma_min: float = 0.01, sigma_max: float = 1.0):
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def g(self, t):
        t = jnp.asarray(t, jnp.float32)
        g2 = self.sigma_max**2 + (self.sigma_min**2 - self.sigma_max**2) * t
        return jnp.sqrt(jnp.maximum(g2, 0.0))

    def F(self, t):
        t = jnp.asarray(t, jnp.float32)
        return self.sigma_max**2 * t + 0.5 * (self.sigma_min**2 - self.sigma_max**2) * t**2


class CosineNoiseScheduler(NoiseScheduler):
    """g(t)^2 = sigma^2 * (1 + cos(pi t)) / 2 — smooth decay to zero."""

    def __init__(self, sigma: float = 1.0):
        self.sigma = sigma

    def g(self, t):
        t = jnp.asarray(t, jnp.float32)
        return self.sigma * jnp.sqrt((1.0 + jnp.cos(math.pi * t)) / 2.0)

    def F(self, t):
        t = jnp.asarray(t, jnp.float32)
        return self.sigma**2 / 2.0 * (t + jnp.sin(math.pi * t) / math.pi)
