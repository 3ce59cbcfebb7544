"""Entropic optimal transport solvers, pure JAX, on-device.

Replaces the POT solvers the reference calls on the host per training batch
(/root/reference/torchcfm/optimal_transport.py:51-55):

- ``pot.sinkhorn``                       -> :func:`sinkhorn` (log-domain)
- ``pot.unbalanced.sinkhorn_knopp_unbalanced`` -> :func:`sinkhorn_unbalanced`
  (supports one reg_m per marginal, covering the runner's two-reg variant at
  runner/src/models/components/sinkhorn_knopp_unbalanced.py:15-201)
- ``pot.partial.entropic_partial_wasserstein`` -> :func:`partial_wasserstein`

All solvers run under ``jit`` via ``lax.while_loop`` with a convergence test +
iteration cap, use log-domain updates for stability at small reg, and keep the
plan in float32 on device. The inner logsumexp reductions are large dense
[n, m] row/col reductions — VPU-shaped work that XLA fuses well.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


@functools.partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn(
    a: jax.Array,
    b: jax.Array,
    M: jax.Array,
    reg: float,
    num_iters: int = 1000,
    tol: float = 1e-6,
) -> jax.Array:
    """Balanced entropic OT plan via log-domain Sinkhorn iterations.

    Matches ``pot.sinkhorn(a, b, M, reg)`` semantics (numItermax=1000) but
    runs entirely on device in float32 — hence the default stop threshold is
    1e-6, not POT's float64 1e-9, which f32 marginal-error sums cannot reach
    (the loop would always run to num_iters).
    """
    loga = jnp.log(a.astype(jnp.float32))
    logb = jnp.log(b.astype(jnp.float32))
    M = M.astype(jnp.float32)
    reg = jnp.asarray(reg, jnp.float32)

    def body(state):
        f, g, _, it = state
        f = reg * (loga - logsumexp((g[None, :] - M) / reg, axis=1))
        g = reg * (logb - logsumexp((f[:, None] - M) / reg, axis=0))
        # After the g update column marginals are exact; measure row error.
        log_plan = (f[:, None] + g[None, :] - M) / reg
        row = jnp.exp(logsumexp(log_plan, axis=1))
        err = jnp.sum(jnp.abs(row - a))
        return f, g, err, it + 1

    def cond(state):
        _, _, err, it = state
        return jnp.logical_and(err > tol, it < num_iters)

    f0 = jnp.zeros_like(loga)
    g0 = jnp.zeros_like(logb)
    f, g, _, _ = jax.lax.while_loop(cond, body, (f0, g0, jnp.asarray(jnp.inf), 0))
    return jnp.exp((f[:, None] + g[None, :] - M) / reg)


def sinkhorn2(a, b, M, reg, num_iters: int = 1000, tol: float = 1e-6) -> jax.Array:
    """Entropic OT cost <plan, M> (``pot.sinkhorn2`` analogue)."""
    plan = sinkhorn(a, b, M, reg, num_iters=num_iters, tol=tol)
    return jnp.sum(plan * M)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn_unbalanced(
    a: jax.Array,
    b: jax.Array,
    M: jax.Array,
    reg: float,
    reg_m: Union[float, Tuple[float, float]] = 1.0,
    num_iters: int = 1000,
    tol: float = 1e-6,
) -> jax.Array:
    """Unbalanced entropic OT (KL-relaxed marginals), log-domain.

    ``reg_m`` may be a scalar or a per-marginal pair ``(reg_m_row, reg_m_col)``
    — the latter reproduces the runner's modified solver used for one-sided
    growth-rate estimation in single-cell data (sinkhorn_knopp_unbalanced.py).
    An infinite reg_m recovers a hard marginal constraint on that side.
    """
    if isinstance(reg_m, (tuple, list)):
        reg_m1, reg_m2 = reg_m
    else:
        reg_m1 = reg_m2 = reg_m
    reg = jnp.asarray(reg, jnp.float32)
    fi1 = jnp.where(jnp.isinf(reg_m1), 1.0, reg_m1 / (reg_m1 + reg))
    fi2 = jnp.where(jnp.isinf(reg_m2), 1.0, reg_m2 / (reg_m2 + reg))
    loga = jnp.log(a.astype(jnp.float32))
    logb = jnp.log(b.astype(jnp.float32))
    logK = -M.astype(jnp.float32) / reg

    def body(state):
        logu, logv, _, it = state
        new_logu = fi1 * (loga - logsumexp(logK + logv[None, :], axis=1))
        new_logv = fi2 * (logb - logsumexp(logK + new_logu[:, None], axis=0))
        err = jnp.max(jnp.abs(jnp.exp(new_logu) - jnp.exp(logu)))
        return new_logu, new_logv, err, it + 1

    def cond(state):
        _, _, err, it = state
        return jnp.logical_and(err > tol, it < num_iters)

    n, m = M.shape
    logu0 = jnp.full((n,), -jnp.log(n), jnp.float32)
    logv0 = jnp.full((m,), -jnp.log(m), jnp.float32)
    logu, logv, _, _ = jax.lax.while_loop(cond, body, (logu0, logv0, jnp.asarray(jnp.inf), 0))
    return jnp.exp(logu[:, None] + logK + logv[None, :])


@functools.partial(jax.jit, static_argnames=("num_iters",))
def partial_wasserstein(
    a: jax.Array,
    b: jax.Array,
    M: jax.Array,
    reg: float,
    mass: Optional[float] = None,
    num_iters: int = 1000,
    tol: float = 1e-7,
) -> jax.Array:
    """Entropic partial OT: transports a fraction ``mass`` of the marginals.

    Follows the iterated-Bregman-projection scheme of Benamou et al. used by
    ``pot.partial.entropic_partial_wasserstein``: alternately project onto
    {row sums <= a}, {col sums <= b}, {total mass = mass}.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if mass is None:
        mass = jnp.minimum(jnp.sum(a), jnp.sum(b))
    mass = jnp.asarray(mass, jnp.float32)
    K0 = jnp.exp(-M.astype(jnp.float32) / reg)
    K0 = K0 * (mass / jnp.maximum(jnp.sum(K0), 1e-30))

    def body(state):
        K, _, it = state
        row_scale = jnp.minimum(a / jnp.maximum(jnp.sum(K, axis=1), 1e-30), 1.0)
        K1 = row_scale[:, None] * K
        col_scale = jnp.minimum(b / jnp.maximum(jnp.sum(K1, axis=0), 1e-30), 1.0)
        K2 = K1 * col_scale[None, :]
        K_new = K2 * (mass / jnp.maximum(jnp.sum(K2), 1e-30))
        err = jnp.max(jnp.abs(K_new - K))
        return K_new, err, it + 1

    def cond(state):
        _, err, it = state
        return jnp.logical_and(err > tol, it < num_iters)

    K, _, _ = jax.lax.while_loop(cond, body, (K0, jnp.asarray(jnp.inf), 0))
    return K
