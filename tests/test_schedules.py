"""Noise-scheduler oracle tests (reference runner schedule.py:5-73)."""

import jax.numpy as jnp
import numpy as np

from cfm_tpu.schedules import (
    ConstantNoiseScheduler,
    CosineNoiseScheduler,
    LinearDecreasingNoiseScheduler,
)


def test_constant_bridge_matches_sbcfm_sigma():
    s = ConstantNoiseScheduler(sigma=0.7)
    t = jnp.linspace(0.01, 0.99, 33)
    np.testing.assert_allclose(
        np.asarray(s.bridge_sigma_t(t)),
        0.7 * np.sqrt(np.asarray(t) * (1 - np.asarray(t))),
        rtol=1e-5,
    )


def test_F_is_integral_of_g_squared():
    for sched in [
        ConstantNoiseScheduler(0.5),
        LinearDecreasingNoiseScheduler(0.1, 1.0),
        CosineNoiseScheduler(0.8),
    ]:
        ts = jnp.linspace(0.0, 1.0, 2001)
        g2 = np.asarray(sched.g(ts)) ** 2
        F_num = np.concatenate([[0.0], np.cumsum((g2[1:] + g2[:-1]) / 2) * (1 / 2000)])
        np.testing.assert_allclose(np.asarray(sched.F(ts)), F_num, atol=2e-4)


def test_bridge_sigma_zero_at_endpoints():
    for sched in [ConstantNoiseScheduler(1.0), CosineNoiseScheduler(1.0)]:
        assert float(sched.bridge_sigma_t(jnp.asarray(0.0))) < 1e-6
        assert float(sched.bridge_sigma_t(jnp.asarray(1.0))) < 1e-3
