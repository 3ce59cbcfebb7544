"""Augmentation / CNF oracle tests.

Closed-form checks for the trace estimators and the CNF change of variables
(reference: runner/src/models/components/augmentation.py and the CNF module
cfm_module.py:1412-1455 — neither is numerically tested in the reference; the
linear-field oracle here pins the math).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu.augment import (
    augmented_odeint,
    batched_divergence,
    cnf_log_likelihood,
    standard_normal_logprob,
)


def test_divergence_linear_field():
    A = jnp.array([[0.5, 0.2], [-0.1, -0.3]])
    f = lambda t, x: x @ A.T
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    div = batched_divergence(f, 0.0, x, method="exact")
    np.testing.assert_allclose(np.asarray(div), float(jnp.trace(A)), rtol=1e-5)


def test_hutch_divergence_unbiased():
    A = jnp.array([[1.0, 0.0], [0.0, -2.0]])
    f = lambda t, x: x @ A.T
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    div = batched_divergence(
        f, 0.0, x, method="hutch", key=jax.random.PRNGKey(2), num_probes=64
    )
    # Diagonal A: Rademacher estimator is exact in expectation; with 64 probes
    # variance is tiny for this 2x2 case.
    np.testing.assert_allclose(np.asarray(div), -1.0, atol=0.5)


def test_regularizer_accumulation_constant_field():
    c = jnp.array([3.0, 4.0])  # ||c|| = 5
    f = lambda t, x: jnp.broadcast_to(c, x.shape)
    x0 = jnp.zeros((4, 2))
    out = augmented_odeint(
        f, x0, jnp.linspace(0, 1, 101), reg_names=("l2", "squared_l2", "l1")
    )
    np.testing.assert_allclose(np.asarray(out.regs["l2"]), 5.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.regs["squared_l2"]), 25.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.regs["l1"]), 3.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.x), np.broadcast_to([3.0, 4.0], (4, 2)), rtol=1e-6)


def test_cnf_log_likelihood_linear_contraction():
    """For dx/dt = -x the flow is x1 = e^{-1} x0; if x0 ~ N(0, I) then
    x1 ~ N(0, e^{-2} I) and log p1(x1) has closed form."""
    f = lambda t, x: -x
    key = jax.random.PRNGKey(3)
    x1 = 0.3 * jax.random.normal(key, (32, 2))
    ll = cnf_log_likelihood(f, x1, n_steps=400, divergence="exact", method="rk4")
    s = math.exp(-1.0)
    expected = (
        -0.5 * (2 * math.log(2 * math.pi) + 2 * math.log(s**2))
        - 0.5 * np.sum(np.asarray(x1) ** 2, axis=1) / s**2
    )
    np.testing.assert_allclose(np.asarray(ll), expected, rtol=1e-3, atol=1e-3)


def test_standard_normal_logprob():
    z = jnp.zeros((2, 3))
    np.testing.assert_allclose(
        np.asarray(standard_normal_logprob(z)),
        -1.5 * math.log(2 * math.pi),
        rtol=1e-6,
    )


def test_cnf_log_likelihood_adaptive_dopri5():
    """Pytree-aware dopri5: the trace-augmented CNF state integrates
    adaptively (the reference's torchdyn dopri5 + augmentation eval path)."""
    f = lambda t, x: -x
    key = jax.random.PRNGKey(4)
    x1 = 0.3 * jax.random.normal(key, (16, 2))
    ll_adaptive = cnf_log_likelihood(f, x1, n_steps=1, divergence="exact",
                                     method="dopri5")
    ll_fixed = cnf_log_likelihood(f, x1, n_steps=400, divergence="exact",
                                  method="rk4")
    np.testing.assert_allclose(np.asarray(ll_adaptive), np.asarray(ll_fixed),
                               rtol=1e-3, atol=1e-3)


def test_augmented_dopri5_regularizers():
    c = jnp.array([3.0, 4.0])
    f = lambda t, x: jnp.broadcast_to(c, x.shape)
    out = augmented_odeint(
        f, jnp.zeros((4, 2)), jnp.linspace(0, 1, 2), reg_names=("l2",),
        method="dopri5",
    )
    np.testing.assert_allclose(np.asarray(out.regs["l2"]), 5.0, rtol=1e-4)


def test_jacobian_frobenius_linear_field_oracle():
    """Jacobian-Frobenius family on f(x) = A x: J = A everywhere, so the
    [0,1] integrals equal ||A||_F^2, sum_i A_ii^2, and their difference
    analytically (reference augmentation.py:59-103)."""
    A = jnp.array([[1.0, 2.0, -1.0], [0.5, -3.0, 0.0], [2.0, 1.0, 4.0]])
    f = lambda t, x: x @ A.T
    x0 = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    final = augmented_odeint(
        f,
        x0,
        jnp.linspace(0.0, 1.0, 11),
        jac_reg_names=(
            "jac_frobenius",
            "jac_diag_frobenius",
            "jac_offdiag_frobenius",
        ),
    )
    frob = float(jnp.sum(A**2))
    diag = float(jnp.sum(jnp.diag(A) ** 2))
    np.testing.assert_allclose(np.asarray(final.regs["jac_frobenius"]), frob, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(final.regs["jac_diag_frobenius"]), diag, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(final.regs["jac_offdiag_frobenius"]), frob - diag, rtol=1e-5
    )


def test_jacobian_frobenius_hutch_unbiased():
    """Hutchinson ||J||_F^2 estimate is unbiased: many probes converge to the
    exact value on a linear field (Finlay et al. 2020 estimator)."""
    from cfm_tpu.augment import batched_jacobian_regs

    A = jnp.array([[1.0, 2.0], [-0.5, 3.0]])
    f = lambda t, x: x @ A.T
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    out = batched_jacobian_regs(
        f, 0.0, x, ("jac_frobenius",), method="hutch",
        key=jax.random.PRNGKey(2), num_probes=256,
    )
    np.testing.assert_allclose(
        np.asarray(out["jac_frobenius"]), float(jnp.sum(A**2)), rtol=0.15
    )


def test_jacobian_reg_unknown_name_raises():
    from cfm_tpu.augment import batched_jacobian_regs

    with pytest.raises(ValueError):
        batched_jacobian_regs(
            lambda t, x: x, 0.0, jnp.zeros((2, 2)), ("nope",)
        )
