"""Variant training objectives: SF2M schedules, DSBM, rectified flow, action
matching, CNF max-likelihood, ICNN OT maps.

Functional re-design of the reference's 11 Lightning variant modules
(/root/reference/runner/src/models/cfm_module.py:532-1455 and
icnn_module.py:36-245). Each variant is a pure loss/target function (plus, for
the outer-loop methods, a pair-regeneration function) that plugs into the
same fused train step — the harness stays a thin consumer.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .integrate import odeint, sdeint
from .schedules import ConstantNoiseScheduler, NoiseScheduler
from .utils import pad_t_like_x

Array = jax.Array


# --------------------------------------------------------------------------
# Schedule-driven bridge (the SF2M generalization of SB-CFM)
# --------------------------------------------------------------------------


class ScheduleBridgeMatcher:
    """Brownian-bridge path under an arbitrary noise schedule.

    Reference: SF2MLitModule.calc_mu_sigma / calc_u (cfm_module.py:836-852):
      mu_t    = x0 + (x1 - x0) F(t)/F(1)
      sigma_t = sqrt(F(t) - F(t)^2/F(1))
      u_t     = sigma'_t/sigma_t (x - mu_t) + (x1 - x0) g(t)^2/F(1)
    With a ConstantNoiseScheduler this reduces exactly to the SB-CFM path.
    The score target is the path noise eps (score_target at :852-870).
    """

    def __init__(self, schedule: Optional[NoiseScheduler] = None, sigma_min: float = 0.1):
        self.schedule = schedule or ConstantNoiseScheduler(sigma_min)

    def sample_location_and_targets(
        self, key: Array, x0: Array, x1: Array, t: Optional[Array] = None
    ) -> Dict[str, Array]:
        t_key, eps_key = jax.random.split(key)
        if t is None:
            t = jax.random.uniform(t_key, (x0.shape[0],), dtype=x0.dtype)
        tx = pad_t_like_x(t, x0)
        s = self.schedule
        ft = s.F(tx)
        fone = s.F(jnp.asarray(1.0))
        mu_t = x0 + (x1 - x0) * ft / fone
        sigma_t = jnp.sqrt(jnp.maximum(ft - ft**2 / fone, 0.0))
        eps = jax.random.normal(eps_key, x0.shape, x0.dtype)
        xt = mu_t + sigma_t * eps

        g2 = s.g(tx) ** 2
        # d/dt sigma_t^2; the correct log-derivative is sigma'_t/sigma_t =
        # (d/dt sigma_t^2) / (2 sigma_t^2). (The reference's calc_u divides by
        # sigma_t once — cfm_module.py:846-851 — with a code comment
        # questioning its own formula; for a constant schedule ours reduces
        # exactly to torchcfm's SB-CFM drift (1-2t)/(2t(1-t)), theirs is 2x.)
        sigma_t_sq_prime = g2 - 2.0 * ft * g2 / fone
        sigma_ratio = sigma_t_sq_prime / (2.0 * sigma_t**2 + 1e-8)
        mu_t_prime = (x1 - x0) * g2 / fone
        ut = sigma_ratio * (xt - mu_t) + mu_t_prime
        return {
            "t": t, "xt": xt, "ut": ut, "eps": eps,
            "mu_t": mu_t, "sigma_t": sigma_t, "g_t": s.g(tx),
        }


def sf2m_score_loss(st: Array, sample: Dict[str, Array]) -> Array:
    """Score loss with the reference's sigma-scaled parameterization
    (cfm_module.py:905-908): mse(-2 sigma_t st / g(t)^2, eps)."""
    scaled = -2.0 * sample["sigma_t"] * st / (sample["g_t"] ** 2 + 1e-8)
    return jnp.mean(jnp.square(scaled - sample["eps"]))


# --------------------------------------------------------------------------
# DSBM — diffusion Schrödinger bridge matching
# --------------------------------------------------------------------------


def dsbm_targets(
    x0: Array, x1: Array, sample: Dict[str, Array], schedule: NoiseScheduler
) -> Tuple[Array, Array, Array, Array]:
    """Forward/backward drift regression targets + loss scalings.

    Reference DSBMLitModule (cfm_module.py:1187-1228):
      fwd target = x1 - x0 - g(t) sqrt(t/(1-t)) eps,   scale 1/(1 + g² t/(1-t))
      bwd target = x0 - x1 - g(t) sqrt((1-t)/t) eps,   scale 1/(1 + g² (1-t)/t)
    """
    t = pad_t_like_x(sample["t"], x0)
    eps = sample["eps"]
    g = schedule.g(t)
    fwd = x1 - x0 - g * jnp.sqrt(t / (1 - t + 1e-6)) * eps
    bwd = x0 - x1 - g * jnp.sqrt((1 - t) / (t + 1e-6)) * eps
    fwd_scale = 1.0 / (1.0 + g**2 * t / (1 - t + 1e-6))
    bwd_scale = 1.0 / (1.0 + g**2 * (1 - t) / (t + 1e-6))
    return fwd, bwd, fwd_scale, bwd_scale


def make_dsbm_loss(
    fwd_apply: Callable, bwd_apply: Callable, schedule: Optional[NoiseScheduler] = None,
    sigma_min: float = 0.1,
):
    """Joint forward+backward drift matching loss (DSBM, shared bridge path)."""
    bridge = ScheduleBridgeMatcher(schedule, sigma_min)
    sched = bridge.schedule

    def loss_fn(params, key, x0, x1):
        sample = bridge.sample_location_and_targets(key, x0, x1)
        fwd_t, bwd_t, fwd_s, bwd_s = dsbm_targets(x0, x1, sample, sched)
        vt = fwd_apply(params["forward"], sample["t"], sample["xt"])
        st = bwd_apply(params["backward"], sample["t"], sample["xt"])
        fwd_loss = jnp.mean(fwd_s * jnp.square(vt - fwd_t))
        bwd_loss = jnp.mean(bwd_s * jnp.square(st - bwd_t))
        loss = fwd_loss + bwd_loss
        return loss, {"loss": loss, "fwd_loss": fwd_loss, "bwd_loss": bwd_loss}

    return loss_fn


def dsbm_ode_drift(fwd_apply, bwd_apply, params) -> Callable:
    """Probability-flow drift (f - b)/2 of the learned bridge
    (DSBMFlowSolver, solver.py:225-269)."""

    def drift(t, x):
        tb = jnp.full((x.shape[0],), t, x.dtype)
        return 0.5 * (fwd_apply(params["forward"], tb, x) - bwd_apply(params["backward"], tb, x))

    return drift


# --------------------------------------------------------------------------
# Rectified flow (reflow)
# --------------------------------------------------------------------------


def reflow_pairs(
    apply_fn: Callable, frozen_params: Any, x0: Array, n_steps: int = 100
) -> Tuple[Array, Array]:
    """Regenerate training pairs from a frozen net: x1 := ODE(frozen, x0).

    The rectification step of RectifiedFlowLitModule (cfm_module.py:645-652):
    after reflow, (x0, x1) pairs lie on the model's own straightened flow.
    """

    def f(t, x):
        return apply_fn(frozen_params, jnp.full((x.shape[0],), t, x.dtype), x)

    ts = jnp.linspace(0.0, 1.0, n_steps + 1)
    x1 = odeint(f, x0, ts, method="euler", return_trajectory=False).final
    return x0, jax.lax.stop_gradient(x1)


def straightness(apply_fn, params, key, x0: Array, n_steps: int = 20) -> Array:
    """Mean squared deviation of the flow from a straight line — the metric
    rectified flow minimizes; 0 iff trajectories are straight."""

    def f(t, x):
        return apply_fn(params, jnp.full((x.shape[0],), t, x.dtype), x)

    ts = jnp.linspace(0.0, 1.0, n_steps + 1)
    sol = odeint(f, x0, ts, method="euler")
    x1 = sol.final
    tshape = (-1,) + (1,) * x0.ndim   # (T, 1, ...) against (T, bs, *dim)
    straight = x0[None] + ts.reshape(tshape) * (x1 - x0)[None]
    return jnp.mean(jnp.square(sol.ys - straight))


# --------------------------------------------------------------------------
# Action matching (Neklyudov et al. 2022)
# --------------------------------------------------------------------------


def make_action_matching_loss(energy_apply: Callable):
    """Energy-based action matching loss (ActionMatchingLitModule,
    cfm_module.py:662-697):

      L = E[ s(0, x0) - s(1, x1) + 1/2 ||ds/dx(t, xt)||^2 + ds/dt(t, xt) ]

    with xt the straight-line interpolant. ``energy_apply(params, t, x)``
    returns the scalar action s per sample, shape (bs,) or (bs, 1).
    """

    def loss_fn(params, key, x0, x1):
        t = jax.random.uniform(key, (x0.shape[0],), dtype=x0.dtype)
        tx = pad_t_like_x(t, x0)
        xt = tx * x1 + (1 - tx) * x0

        def s_scalar(ti, xi):
            out = energy_apply(params, ti[None], xi[None])
            return jnp.sum(out)

        dsdt = jax.vmap(jax.grad(s_scalar, argnums=0))(t, xt)
        dsdx = jax.vmap(jax.grad(s_scalar, argnums=1))(t, xt)
        a0 = energy_apply(params, jnp.zeros_like(t), x0).reshape(-1)
        a1 = energy_apply(params, jnp.ones_like(t), x1).reshape(-1)
        kinetic = 0.5 * jnp.sum(jnp.square(dsdx.reshape(x0.shape[0], -1)), axis=1)
        loss = jnp.mean(a0 - a1 + kinetic + dsdt.reshape(-1))
        return loss, {"loss": loss}

    return loss_fn


# --------------------------------------------------------------------------
# CNF exact maximum likelihood
# --------------------------------------------------------------------------


def make_cnf_nll_loss(apply_fn: Callable, n_steps: int = 50, divergence: str = "exact",
                      num_probes: int = 1, adaptive: bool = False,
                      rtol: float = 1e-5, atol: float = 1e-5):
    """Negative log-likelihood loss via backward trace-augmented integration
    (CNFLitModule, cfm_module.py:1412-1455).

    ``adaptive=False`` (default): fixed-step scan, differentiable by plain
    autodiff (discretize-then-optimize). ``adaptive=True``: error-controlled
    dopri5 through ``integrate.odeint_adjoint`` (continuous adjoint) — the
    reference's torchdyn-adjoint CNF training mode at adaptive tolerances
    (solver.py:192-216), O(state) memory instead of O(n_steps).
    """
    from .augment import (
        AugmentedState,
        cnf_log_likelihood,
        make_augmented_field,
        standard_normal_logprob,
    )

    def loss_fn(params, key, x0, x1):
        del x0  # CNF trains on data x1 against the N(0, I) base

        if adaptive:
            from .integrate import odeint_adjoint

            def field(p, t, state):
                base = lambda tt, xx: apply_fn(
                    p, jnp.full((xx.shape[0],), tt, xx.dtype), xx
                )
                aug = make_augmented_field(
                    base, divergence=divergence, div_key=key,
                    num_probes=num_probes,
                )
                return aug(t, state)

            init = AugmentedState(
                x=x1, logp=jnp.zeros(x1.shape[0], x1.dtype), regs={}
            )
            final = odeint_adjoint(field, params, init,
                                   jnp.array([1.0, 0.0]), rtol=rtol, atol=atol)
            ll = standard_normal_logprob(final.x) - final.logp
        else:
            def f(t, x):
                return apply_fn(params, jnp.full((x.shape[0],), t, x.dtype), x)

            ll = cnf_log_likelihood(
                f, x1, n_steps=n_steps, divergence=divergence, key=key,
                num_probes=num_probes,
            )
        loss = -jnp.mean(ll)
        return loss, {"loss": loss, "nll_per_dim": loss / x1[0].size}

    return loss_fn


# --------------------------------------------------------------------------
# ICNN dual OT (Makkuva et al.)
# --------------------------------------------------------------------------


def make_icnn_losses(f_module, g_module):
    """Minimax dual-ICNN OT losses (ICNNLitModule, icnn_module.py:36-245).

    The map is T = grad g; f is the dual potential. Losses:
      L_g = E_x[ f(grad g(x)) - <x, grad g(x)> ]     (minimize over g)
      L_f = E_y[ f(y) ] - E_x[ f(grad g(x)) ]        (minimize over f)
    Convexity is guaranteed architecturally (softplus-positive Wz weights in
    cfm_tpu.models.ICNN), so no weight clipping/penalty is needed.
    """

    def grad_g(g_params, x):
        def g_scalar(xi):
            return g_module.apply(g_params, xi[None])[0, 0]

        return jax.vmap(jax.grad(g_scalar))(x)

    def g_loss(g_params, f_params, x):
        Tx = grad_g(g_params, x)
        fTx = f_module.apply(f_params, Tx)[:, 0]
        corr = jnp.sum(x * Tx, axis=1)
        loss = jnp.mean(fTx - corr)
        return loss, {"g_loss": loss}

    def f_loss(f_params, g_params, x, y):
        Tx = jax.lax.stop_gradient(grad_g(g_params, x))
        loss = jnp.mean(f_module.apply(f_params, y)[:, 0]) - jnp.mean(
            f_module.apply(f_params, Tx)[:, 0]
        )
        return loss, {"f_loss": loss}

    def w2_estimate(f_params, g_params, x, y):
        """Dual estimate of (1/2) W2^2, the reference's convention
        (icnn_module.py:229-245 compute_w2: E[f(grad_g) - f(y) - <x, grad_g>]
        + (1/2)E||x||^2 + (1/2)E||y||^2, roles of x/y swapped here): the
        Kantorovich dual gives W2^2 = E||x||^2 + E||y||^2 - 2 sup(dual), so
        the estimate is half the squared distance, >= 0 at the optimum."""
        Tx = grad_g(g_params, x)
        fTx = f_module.apply(f_params, Tx)[:, 0]
        fy = f_module.apply(f_params, y)[:, 0]
        corr = jnp.sum(x * Tx, axis=1)
        dual = jnp.mean(corr - fTx) + jnp.mean(fy)
        return 0.5 * (jnp.mean(jnp.sum(x**2, 1)) + jnp.mean(jnp.sum(y**2, 1))) - dual

    return g_loss, f_loss, grad_g, w2_estimate


def make_oneway_dsbm_loss(
    fwd_apply: Callable, schedule: Optional[NoiseScheduler] = None, sigma_min: float = 0.1
):
    """Single forward-drift bridge matching (OneWaySF2MLitModule,
    cfm_module.py:1088-1118): only the forward SDE drift is regressed, with
    the same t/(1-t) scaling as DSBM's forward half. (The reference's
    eps reconstruction there rescales the noise by -2/g^2 against its own
    SF2M convention; we keep the DSBM-consistent target.)
    """
    bridge = ScheduleBridgeMatcher(schedule, sigma_min)
    sched = bridge.schedule

    def loss_fn(params, key, x0, x1):
        sample = bridge.sample_location_and_targets(key, x0, x1)
        fwd_t, _, fwd_s, _ = dsbm_targets(x0, x1, sample, sched)
        vt = fwd_apply(params, sample["t"], sample["xt"])
        loss = jnp.mean(fwd_s * jnp.square(vt - fwd_t))
        return loss, {"loss": loss}

    return loss_fn


def ipf_resample_pairs(
    key: Array,
    drift_apply: Callable,
    drift_params: Any,
    x_start: Array,
    schedule: Optional[NoiseScheduler] = None,
    sigma_min: float = 0.1,
    n_steps: int = 100,
    reverse: bool = False,
) -> Tuple[Array, Array]:
    """IPF-style outer-loop pair regeneration (SF2M/DSBM outer loop,
    cfm_module.py:1012-1044): simulate the current forward (or backward) SDE
    from one marginal to synthesize the other, producing the next bridge
    iteration's training pairs.

    Forward:  dx = f(t, x) dt + g(t) dW   from x0, t: 0 -> 1, returns (x0, x1')
    Backward: dx = b(t, x) dt + g(t) dW   from x1, integrating the backward
              drift in reversed time, returns (x0', x1).
    """
    sched = schedule or ConstantNoiseScheduler(sigma_min)

    def drift(t, x):
        tb = jnp.full((x.shape[0],), t, x.dtype)
        return drift_apply(drift_params, tb, x)

    def diffusion(t, x):
        return sched.g(jnp.asarray(t)) * jnp.ones_like(x)

    if not reverse:
        ts = jnp.linspace(0.0, 1.0, n_steps + 1)
        out = sdeint(drift, diffusion, key, x_start, ts, return_trajectory=False)
        return x_start, jax.lax.stop_gradient(out.final)
    # Backward drift: b(t, x) is parameterized in forward time t but is the
    # drift of the REVERSE-time process (dy/ds = b(1-s, y), s = 1-t, ds > 0).
    # Integrate on the positive s-grid with the time-flipped drift — the
    # same treatment FlowSolver.sdeint(reverse=True) applies. (Feeding the
    # raw drift a 1->0 grid would negate it: x += b*dt with dt < 0 steps
    # AWAY from the x0 marginal.)
    ts = jnp.linspace(0.0, 1.0, n_steps + 1)
    bdrift = lambda s, x: drift(1.0 - s, x)
    bdiff = lambda s, x: diffusion(1.0 - s, x)
    out = sdeint(bdrift, bdiff, key, x_start, ts, return_trajectory=False)
    return jax.lax.stop_gradient(out.final), x_start


def average_ut(
    key: Array, x: Array, mu_t: Array, sigma_t, ut: Array, avg_size: int
) -> Array:
    """Marginal-averaged velocity target (reference CFMLitModule.average_ut,
    cfm_module.py:201-214): when the whole batch shares one t, each sample's
    target becomes the density-weighted average of ``avg_size`` conditional
    velocities,

        u_bar(x) = sum_j p_t(x | z_j) u_t(x | z_j) / sum_j p_t(x | z_j),

    a lower-variance estimate of the true marginal vector field.
    """
    bs = x.shape[0]
    flat_x = x.reshape(bs, -1)
    flat_mu = mu_t.reshape(bs, -1)
    d2 = (
        jnp.sum(flat_x**2, 1)[:, None]
        + jnp.sum(flat_mu**2, 1)[None, :]
        - 2.0 * flat_x @ flat_mu.T
    )
    sig2 = jnp.asarray(sigma_t, jnp.float32) ** 2
    log_pt = -0.5 * d2 / jnp.maximum(sig2, 1e-12)           # (bs, bs)
    idx = jax.random.randint(key, (bs, avg_size - 1), 0, bs)
    idx = jnp.concatenate([idx, jnp.arange(bs)[:, None]], axis=1)  # include self
    log_pt_sub = jnp.take_along_axis(log_pt, idx, axis=1)    # (bs, avg)
    w = jax.nn.softmax(log_pt_sub, axis=1)                   # normalized weights
    ut_sub = ut.reshape(bs, -1)[idx]                         # (bs, avg, d)
    out = jnp.sum(w[:, :, None] * ut_sub, axis=1)
    return out.reshape(ut.shape)
