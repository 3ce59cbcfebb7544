"""Schrödinger-bridge closed-form oracle: the strongest end-to-end check.

Trains SB-CFM on the two-Gaussian benchmark and asserts the generated
marginals match the analytic bridge (Mallasto et al. 2020) in KL — the
reference logs this as kl/mean (cfm_module.py:457-470) but never asserts it.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu import SchrodingerBridgeConditionalFlowMatcher
from cfm_tpu.eval.sb_oracle import (
    gaussian_kl,
    sample_sb_endpoints,
    sb_gaussian_marginal,
    sb_marginal_kl,
)
from cfm_tpu.integrate import odeint, vector_field_from_model
from cfm_tpu.models import MLP
from cfm_tpu.train import init_train_state, make_optimizer, make_train_step


def test_marginal_endpoints():
    a, sigma = 0.1, 0.5
    mean0, cov0 = sb_gaussian_marginal(a, sigma, 0.0, 2)
    mean1, cov1 = sb_gaussian_marginal(a, sigma, 1.0, 2)
    np.testing.assert_allclose(np.asarray(mean0), -a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mean1), a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov0), np.eye(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov1), np.eye(2), atol=1e-6)


def test_gaussian_kl_zero_for_identical():
    m = jnp.array([1.0, -1.0])
    c = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    assert abs(float(gaussian_kl(m, c, m, c))) < 1e-5


def test_kl_of_exact_marginal_samples_is_small():
    a, sigma, t = 0.1, 0.7, 0.4
    mean, cov = sb_gaussian_marginal(a, sigma, t, 2)
    key = jax.random.PRNGKey(0)
    x = jax.random.multivariate_normal(key, mean, cov, (20000,))
    kl = float(sb_marginal_kl(x, a, sigma, t))
    assert kl < 5e-3, kl


def test_sbcfm_learns_the_bridge():
    """Train SB-CFM on the benchmark; mid-time marginal KL must be small."""
    a, sigma = 0.1, 0.5
    FM = SchrodingerBridgeConditionalFlowMatcher(sigma=sigma, ot_method="sinkhorn")
    model = MLP(dim=2, w=64)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=2e-3, warmup_steps=0)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(FM, model.apply, opt, ema_decay=0.99))
    for i in range(400):
        key, kd, ks = jax.random.split(key, 3)
        x0, x1 = sample_sb_endpoints(kd, 256, a=a)
        state, _ = step(state, ks, x0, x1)

    key, kg = jax.random.split(key)
    x0, _ = sample_sb_endpoints(kg, 4096, a=a)
    f = vector_field_from_model(model.apply, state.ema_params)
    ts = jnp.linspace(0.0, 1.0, 21)
    sol = odeint(f, x0, ts, method="rk4")
    kls = [float(sb_marginal_kl(sol.ys[i], a, sigma, float(ts[i])))
           for i in range(0, 21, 5)]
    # Probability-flow-ODE marginals of a well-trained SB-CFM match the
    # analytic bridge marginals; tolerance generous for 400 quick steps.
    assert max(kls) < 0.15, kls
