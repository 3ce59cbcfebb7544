"""Conditional probability paths and flow matchers — the core CFM math.

TPU-native re-design of /root/reference/torchcfm/conditional_flow_matching.py
(:41-618). The five matchers keep the reference's class API so users can port
code mentally 1:1, but every sampling method takes an explicit PRNG ``key``
(JAX functional RNG) and is pure — the whole
``sample_location_and_conditional_flow`` call, including the minibatch OT
coupling of the OT/SB variants, traces into a single XLA program under
``jax.jit`` (the reference breaks the device at optimal_transport.py:87).

Matchers:
- ConditionalFlowMatcher            (I-CFM, Tong et al.)     ref :41-217
- ExactOptimalTransportConditionalFlowMatcher (OT-CFM)       ref :220-316
- TargetConditionalFlowMatcher      (Lipman FM)               ref :319-394
- SchrodingerBridgeConditionalFlowMatcher (SB-CFM / [SF]2M)   ref :397-556
- VariancePreservingConditionalFlowMatcher (Albergo SI)       ref :559-618
"""

from __future__ import annotations

import math
import warnings
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .coupling import OTPlanSampler
from .utils import pad_t_like_x

Array = jax.Array


class ConditionalFlowMatcher:
    """Independent-coupling CFM: path N(t x1 + (1-t) x0, sigma^2), u_t = x1 - x0."""

    def __init__(self, sigma: Union[float, int] = 0.0):
        self.sigma = sigma

    # -- path pieces (template methods overridden by variants) ----------------

    def compute_mu_t(self, x0: Array, x1: Array, t) -> Array:
        """mu_t = t x1 + (1-t) x0 (ref :63-85)."""
        t = pad_t_like_x(t, x0)
        return t * x1 + (1 - t) * x0

    def compute_sigma_t(self, t):
        """sigma_t = sigma, constant (ref :87-104)."""
        del t
        return self.sigma

    def sample_xt(self, x0: Array, x1: Array, t, epsilon: Array) -> Array:
        """xt ~ N(mu_t, sigma_t^2) via reparameterization (ref :106-129)."""
        mu_t = self.compute_mu_t(x0, x1, t)
        sigma_t = pad_t_like_x(self.compute_sigma_t(t), x0)
        return mu_t + sigma_t * epsilon

    def compute_conditional_flow(self, x0: Array, x1: Array, t, xt: Array) -> Array:
        """u_t(x | x0, x1) = x1 - x0 (ref :131-154)."""
        del t, xt
        return x1 - x0

    def sample_noise_like(self, key: Array, x: Array) -> Array:
        return jax.random.normal(key, x.shape, x.dtype)

    # -- main entry point ------------------------------------------------------

    def sample_location_and_conditional_flow(
        self,
        key: Array,
        x0: Array,
        x1: Array,
        t: Optional[Array] = None,
        return_noise: bool = False,
        return_coupling_status: bool = False,
    ):
        """Draw (t, xt, ut[, eps]) for a training batch (ref :159-199).

        ``key`` drives both the t draw (if ``t`` is None) and the path noise.
        ``return_coupling_status=True`` appends a traced boolean that is
        always False for uncoupled matchers; the OT/SB matchers override it
        with the real degenerate-solve flag (see _CoupledMixin).

        >>> import jax, jax.numpy as jnp
        >>> m = ConditionalFlowMatcher(sigma=0.1)
        >>> key = jax.random.PRNGKey(0)
        >>> x0, x1 = jnp.zeros((4, 2)), jnp.ones((4, 2))
        >>> t, xt, ut = m.sample_location_and_conditional_flow(key, x0, x1)
        >>> t.shape, xt.shape, ut.shape
        ((4,), (4, 2), (4, 2))
        >>> bool(jnp.allclose(ut, x1 - x0))  # I-CFM target is the straight line
        True
        >>> t_fixed = jnp.full((4,), 0.5)
        >>> t2, _, _ = m.sample_location_and_conditional_flow(key, x0, x1, t=t_fixed)
        >>> bool(jnp.all(t2 == 0.5))
        True
        """
        t_key, eps_key = jax.random.split(key)
        if t is None:
            t = jax.random.uniform(t_key, (x0.shape[0],), dtype=x0.dtype)
        assert t.shape[0] == x0.shape[0], "t has to have batch size dimension"
        eps = self.sample_noise_like(eps_key, x0)
        xt = self.sample_xt(x0, x1, t, eps)
        ut = self.compute_conditional_flow(x0, x1, t, xt)
        out = (t, xt, ut, eps) if return_noise else (t, xt, ut)
        return out + (jnp.zeros((), bool),) if return_coupling_status else out

    def compute_lambda(self, t) -> Array:
        """Score weighting lambda(t) = 2 sigma_t / (sigma^2 + 1e-8) (ref :201-217)."""
        sigma_t = self.compute_sigma_t(t)
        return 2 * sigma_t / (self.sigma**2 + 1e-8)

    def compute_score_target(self, xt: Array, x0: Array, x1: Array, t) -> Array:
        """Conditional score nabla log p_t(x | x0, x1) = -(xt - mu_t) / sigma_t^2."""
        mu_t = self.compute_mu_t(x0, x1, t)
        sigma_t = pad_t_like_x(self.compute_sigma_t(t), xt)
        return -(xt - mu_t) / (sigma_t**2 + 1e-8)


class _CoupledMixin:
    """Shared guided/unguided coupled sampling for the OT and SB matchers."""

    ot_sampler: OTPlanSampler

    def without_coupling(self):
        """A view of this matcher whose sampling skips the OT re-pairing.

        Used when the coupling is applied externally — e.g. the data-parallel
        train step replicates the (B, B) plan solve across devices and feeds
        pre-coupled pairs (cfm_tpu.train.make_data_parallel_train_step) —
        while the path math (mu_t/sigma_t/u_t, compute_lambda) stays this
        matcher's own.
        """
        import copy

        clone = copy.copy(self)
        clone._skip_coupling = True
        return clone

    def sample_location_and_conditional_flow(
        self, key: Array, x0: Array, x1: Array, t=None, return_noise: bool = False,
        return_coupling_status: bool = False,
    ):
        """Coupled (t, xt, ut[, eps][, degenerate]) draw.

        ``return_coupling_status=True`` appends the traced degenerate-solve
        boolean from :meth:`OTPlanSampler.sample_plan` — True when the OT
        solve collapsed and the uniform/independent fallback fired. This is
        the jit-observable replacement for the reference's eager print
        (optimal_transport.py:88-97); ``make_train_step`` threads it into the
        ``coupling_degenerate`` step metric.
        """
        if getattr(self, "_skip_coupling", False):
            out = ConditionalFlowMatcher.sample_location_and_conditional_flow(
                self, key, x0, x1, t, return_noise
            )
            return out + (jnp.zeros((), bool),) if return_coupling_status else out
        plan_key, path_key = jax.random.split(key)
        x0, x1, bad = self.ot_sampler.sample_plan(
            plan_key, x0, x1, return_status=True
        )
        out = ConditionalFlowMatcher.sample_location_and_conditional_flow(
            self, path_key, x0, x1, t, return_noise
        )
        return out + (bad,) if return_coupling_status else out

    def guided_sample_location_and_conditional_flow(
        self,
        key: Array,
        x0: Array,
        x1: Array,
        y0: Optional[Array] = None,
        y1: Optional[Array] = None,
        t=None,
        return_noise: bool = False,
        return_coupling_status: bool = False,
    ):
        """Label-carrying coupled sampling (ref :274-316, :489-556).

        ``return_coupling_status=True`` appends the degenerate-solve boolean
        (see :meth:`sample_location_and_conditional_flow`).
        """
        if getattr(self, "_skip_coupling", False):
            path_key = key
            bad = jnp.zeros((), bool)
        else:
            plan_key, path_key = jax.random.split(key)
            x0, x1, y0, y1, bad = self.ot_sampler.sample_plan_with_labels(
                plan_key, x0, x1, y0, y1, return_status=True
            )
        out = ConditionalFlowMatcher.sample_location_and_conditional_flow(
            self, path_key, x0, x1, t, return_noise
        )
        if return_noise:
            t, xt, ut, eps = out
            out = (t, xt, ut, y0, y1, eps)
        else:
            t, xt, ut = out
            out = (t, xt, ut, y0, y1)
        return out + (bad,) if return_coupling_status else out


class ExactOptimalTransportConditionalFlowMatcher(_CoupledMixin, ConditionalFlowMatcher):
    """OT-CFM: I-CFM path on minibatch pairs re-drawn from the exact OT plan.

    Reference :220-316. The exact plan is solved on device (auction
    assignment) so the full training step stays inside one XLA program.
    """

    def __init__(self, sigma: Union[float, int] = 0.0, solver: str = "auto"):
        super().__init__(sigma)
        self.ot_sampler = OTPlanSampler(method="exact", solver=solver)


class TargetConditionalFlowMatcher(ConditionalFlowMatcher):
    """Lipman et al. 2023 flow matching: mu_t = t x1, sigma_t = 1 - (1 - sigma) t."""

    def compute_mu_t(self, x0, x1, t):
        """mu_t = t x1 (ref :329-350)."""
        del x0
        t = pad_t_like_x(t, x1)
        return t * x1

    def compute_sigma_t(self, t):
        """sigma_t = 1 - (1 - sigma) t (ref :352-367)."""
        return 1 - (1 - self.sigma) * t

    def compute_conditional_flow(self, x0, x1, t, xt):
        """u_t = (x1 - (1 - sigma) xt) / (1 - (1 - sigma) t) (ref :369-394)."""
        del x0
        t = pad_t_like_x(t, x1)
        return (x1 - (1 - self.sigma) * xt) / (1 - (1 - self.sigma) * t)


class SchrodingerBridgeConditionalFlowMatcher(_CoupledMixin, ConditionalFlowMatcher):
    """SB-CFM / [SF]2M: Brownian-bridge path with entropic or exact OT coupling.

    sigma_t = sigma sqrt(t (1-t)); u_t = (1-2t)/(2t(1-t)) (xt - mu_t) + x1 - x0.
    Reference :397-556 (entropic reg = 2 sigma^2, sigma > 0 enforced).
    """

    def __init__(
        self,
        sigma: Union[float, int] = 1.0,
        ot_method: str = "exact",
        solver: str = "auto",
    ):
        if sigma <= 0:
            raise ValueError(f"Sigma must be strictly positive, got {sigma}.")
        elif sigma < 1e-3:
            warnings.warn("Small sigma values may lead to numerical instability.")
        super().__init__(sigma)
        self.ot_method = ot_method
        self.ot_sampler = OTPlanSampler(method=ot_method, reg=2 * sigma**2, solver=solver)

    def compute_sigma_t(self, t):
        """sigma_t = sigma sqrt(t (1-t)) (ref :427-444)."""
        return self.sigma * jnp.sqrt(t * (1 - t))

    def compute_conditional_flow(self, x0, x1, t, xt):
        """u_t = (1-2t)/(2t(1-t)+eps) (xt - mu_t) + x1 - x0 (ref :446-476)."""
        t = pad_t_like_x(t, x0)
        mu_t = self.compute_mu_t(x0, x1, t)
        sigma_t_prime_over_sigma_t = (1 - 2 * t) / (2 * t * (1 - t) + 1e-8)
        return sigma_t_prime_over_sigma_t * (xt - mu_t) + x1 - x0


class VariancePreservingConditionalFlowMatcher(ConditionalFlowMatcher):
    """Albergo & Vanden-Eijnden trigonometric stochastic interpolant.

    mu_t = cos(pi t / 2) x0 + sin(pi t / 2) x1;
    u_t  = pi/2 (cos(pi t / 2) x1 - sin(pi t / 2) x0).  Reference :559-618.
    """

    def compute_mu_t(self, x0, x1, t):
        t = pad_t_like_x(t, x0)
        return jnp.cos(math.pi / 2 * t) * x0 + jnp.sin(math.pi / 2 * t) * x1

    def compute_conditional_flow(self, x0, x1, t, xt):
        del xt
        t = pad_t_like_x(t, x0)
        return math.pi / 2 * (jnp.cos(math.pi / 2 * t) * x1 - jnp.sin(math.pi / 2 * t) * x0)
