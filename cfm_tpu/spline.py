"""Natural cubic splines + spline-CFM multi-marginal conditional paths.

TPU-native counterpart of the reference's SplineCFMLitModule
(/root/reference/runner/src/models/cfm_module.py:1352-1409), which leans on
the ``torchcubicspline`` package: fit a natural cubic spline through each
sample's OT-chained trajectory (one point per timepoint), then use
mu_t = spline(t) and u_t = spline'(t) as the conditional path/flow.

The spline coefficients come from the classic natural-spline tridiagonal
system, solved with a dense ``jnp.linalg.solve`` over the (small) number of
knots — batched over samples and dimensions by construction, jit/vmap-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .coupling import OTPlanSampler
from .utils import pad_t_like_x

Array = jax.Array


class CubicSpline(NamedTuple):
    """Natural cubic spline through (ts[k], ys[..., k, :]) knots.

    ts: (K,) strictly increasing knot times.
    ys: (..., K, D) values; m: (..., K, D) second derivatives at knots.
    """

    ts: Array
    ys: Array
    m: Array

    def evaluate(self, t: Array) -> Array:
        """Spline value at scalar or (...,)-broadcastable time t."""
        return _spline_eval(self, t, derivative=False)

    def derivative(self, t: Array) -> Array:
        return _spline_eval(self, t, derivative=True)


def fit_natural_cubic_spline(ts: Array, ys: Array) -> CubicSpline:
    """Fit natural cubic splines along axis -2 of ``ys``.

    ts: (K,) knot times; ys: (..., K, D). Natural boundary (y'' = 0 at ends).
    """
    K = ts.shape[0]
    h = ts[1:] - ts[:-1]  # (K-1,)
    # Tridiagonal system A m = rhs for interior second derivatives.
    A = jnp.zeros((K, K))
    A = A.at[0, 0].set(1.0).at[K - 1, K - 1].set(1.0)
    for i in range(1, K - 1):
        A = A.at[i, i - 1].set(h[i - 1])
        A = A.at[i, i].set(2.0 * (h[i - 1] + h[i]))
        A = A.at[i, i + 1].set(h[i])
    d = (ys[..., 1:, :] - ys[..., :-1, :]) / h[:, None]  # (..., K-1, D)
    rhs = jnp.zeros_like(ys)
    rhs = rhs.at[..., 1 : K - 1, :].set(6.0 * (d[..., 1:, :] - d[..., :-1, :]))
    # Solve for every batch/dim at once: A (K,K) m = rhs (..., K, D) —
    # jnp.linalg.solve broadcasts A over the batch dims (better conditioned
    # than materializing inv(A) for closely-spaced knots).
    m = jnp.linalg.solve(A, rhs)
    return CubicSpline(ts=ts, ys=ys, m=m)


def _spline_eval(sp: CubicSpline, t: Array, derivative: bool) -> Array:
    ts, ys, m = sp.ts, sp.ys, sp.m
    K = ts.shape[0]
    t = jnp.asarray(t)

    # Scalar-time fast path (the common case inside the training step): one
    # segment index for the whole batch.
    if t.ndim == 0:
        idx = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, K - 2)
        t0, t1 = ts[idx], ts[idx + 1]
        h = t1 - t0
        y0, y1 = ys[..., idx, :], ys[..., idx + 1, :]
        m0, m1 = m[..., idx, :], m[..., idx + 1, :]
        a = (t1 - t) / h
        b = (t - t0) / h
        if not derivative:
            return (
                a * y0 + b * y1
                + ((a**3 - a) * m0 + (b**3 - b) * m1) * (h**2) / 6.0
            )
        return (
            (y1 - y0) / h
            + ((3 * b**2 - 1) * m1 - (3 * a**2 - 1) * m0) * h / 6.0
        )
    # Batched time. Per-sample splines (ys/m leading dim == len(t)) pair
    # t[i] with spline i; a SHARED spline (no leading batch dim, or leading
    # dim 1) broadcasts across every t — the '(...)-broadcastable time'
    # contract (a mismatched leading dim raises instead of mispairing).
    if ys.ndim == 2 or (ys.ndim > 2 and ys.shape[0] == 1 != t.shape[0]):
        shared_ys = ys if ys.ndim == 2 else ys[0]
        shared_m = m if m.ndim == 2 else m[0]
        return jax.vmap(
            lambda ti: _spline_eval(
                CubicSpline(ts, shared_ys, shared_m), ti, derivative
            )
        )(t)
    if ys.shape[0] != t.shape[0]:
        raise ValueError(
            f"time batch {t.shape[0]} does not match spline batch {ys.shape[0]}"
        )
    return jax.vmap(
        lambda ti, yi, mi: _spline_eval(CubicSpline(ts, yi, mi), ti, derivative)
    )(t, ys, m)


class SplineConditionalFlowMatcher:
    """Spline-CFM: per-sample cubic-spline path through OT-chained timepoints.

    Given a population trajectory tensor X (bs, T, D), chains per-timepoint OT
    plans (``OTPlanSampler.sample_trajectory``), fits a natural cubic spline
    through each chained trajectory, and samples (t, xt, ut) with
    xt = spline(t) + sigma eps and ut = spline'(t) — reference
    SplineCFMLitModule semantics with the coupling kept on device.
    """

    def __init__(self, sigma: float = 0.0, ot_method: str = "exact"):
        self.sigma = sigma
        self.ot_sampler = OTPlanSampler(method=ot_method) if ot_method != "none" else None

    def sample_location_and_conditional_flow(
        self, key: Array, X: Array, ts: Optional[Array] = None
    ) -> Tuple[Array, Array, Array]:
        bs, T = X.shape[0], X.shape[1]
        knot_ts = jnp.linspace(0.0, float(T - 1), T) if ts is None else ts
        plan_key, t_key, eps_key = jax.random.split(key, 3)
        traj = (
            self.ot_sampler.sample_trajectory(plan_key, X)
            if self.ot_sampler is not None
            else X
        )
        spline = fit_natural_cubic_spline(knot_ts, traj.reshape(bs, T, -1))
        t = jax.random.uniform(
            t_key, (bs,), minval=knot_ts[0], maxval=knot_ts[-1], dtype=X.dtype
        )
        mu_t = spline.evaluate(t).reshape((bs,) + X.shape[2:])
        ut = spline.derivative(t).reshape((bs,) + X.shape[2:])
        eps = jax.random.normal(eps_key, mu_t.shape, X.dtype)
        xt = mu_t + self.sigma * eps
        return t, xt, ut
