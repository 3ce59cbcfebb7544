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

    >>> import jax, jax.numpy as jnp
    >>> key = jax.random.PRNGKey(0)
    >>> M = jnp.sum((jax.random.normal(key, (8, 1, 2))
    ...              - jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 2))) ** 2, -1)
    >>> a = jnp.full((8,), 1.0 / 8)
    >>> plan = sinkhorn(a, a, M, reg=0.5)
    >>> plan.shape
    (8, 8)
    >>> bool(jnp.allclose(plan.sum(axis=1), a, atol=1e-5))  # marginals honored
    True
    """
    loga = jnp.log(a.astype(jnp.float32))
    logb = jnp.log(b.astype(jnp.float32))
    M = M.astype(jnp.float32)
    f, g = sinkhorn_potentials(loga, logb, M, reg, num_iters=num_iters, tol=tol)
    reg = jnp.asarray(reg, jnp.float32)
    return jnp.exp((f[:, None] + g[None, :] - M) / reg)


def sinkhorn_potentials(
    loga: jax.Array,
    logb: jax.Array,
    M: jax.Array,
    reg: float,
    num_iters: int = 1000,
    tol: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """The log-domain Sinkhorn fixed-point loop, returning potentials (f, g).

    The ONE implementation behind both :func:`sinkhorn` (dense plan) and the
    flash path's materialized-cost twin
    (ops/flash_sinkhorn._flash_sinkhorn_xla) — a numerics fix here reaches
    every consumer. Stops when the row-marginal L1 error (columns are exact
    after each g update) drops below ``tol`` or at ``num_iters``. The error
    is measured every 10th iteration (POT's amortization): the check is a
    third full (n, m) logsumexp on top of the two the update itself needs,
    so per-iteration checking costs ~50% more reduction work for the same
    fixed point — the loop may only overshoot convergence by <10 updates.
    """
    reg = jnp.asarray(reg, jnp.float32)
    check_every = 10

    def body(state):
        f, g, err, it = state
        f = reg * (loga - logsumexp((g[None, :] - M) / reg, axis=1))
        g = reg * (logb - logsumexp((f[:, None] - M) / reg, axis=0))

        # After the g update column marginals are exact; measure row error.
        def measure(_):
            log_plan = (f[:, None] + g[None, :] - M) / reg
            row = jnp.exp(logsumexp(log_plan, axis=1))
            return jnp.sum(jnp.abs(row - jnp.exp(loga)))

        err = jax.lax.cond(
            (it + 1) % check_every == 0, measure, lambda _: err, None
        )
        return f, g, err, it + 1

    def cond(state):
        _, _, err, it = state
        return jnp.logical_and(err > tol, it < num_iters)

    f0 = jnp.zeros_like(loga)
    g0 = jnp.zeros_like(logb)
    f, g, _, _ = jax.lax.while_loop(
        cond, body, (f0, g0, jnp.asarray(jnp.inf, jnp.float32), 0)
    )
    return f, g


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


def round_to_feasible(plan: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Round a near-feasible plan onto the transport polytope U(a, b).

    Altschuler–Weed–Rigollet (NeurIPS 2017) rounding: clip row sums to at
    most ``a``, then column sums to at most ``b``, then distribute the
    remaining mass as the rank-one outer product of the marginal deficits.
    The result satisfies both marginals exactly (up to float32), moving at
    most ||residual||_1 mass. Fully jittable; used to turn the entropic
    ε-annealed plan into an exactly-feasible coupling on device.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    plan = plan.astype(jnp.float32)
    row = jnp.sum(plan, axis=1)
    plan = plan * jnp.minimum(a / jnp.maximum(row, 1e-38), 1.0)[:, None]
    col = jnp.sum(plan, axis=0)
    plan = plan * jnp.minimum(b / jnp.maximum(col, 1e-38), 1.0)[None, :]
    err_a = a - jnp.sum(plan, axis=1)
    err_b = b - jnp.sum(plan, axis=0)
    total_err = jnp.sum(err_a)
    correction = err_a[:, None] * err_b[None, :] / jnp.maximum(total_err, 1e-38)
    return plan + jnp.where(total_err > 1e-38, correction, 0.0)


@functools.partial(
    jax.jit, static_argnames=("num_phases", "inner_iters", "polish_iters")
)
def emd_annealed(
    a: jax.Array,
    b: jax.Array,
    M: jax.Array,
    num_phases: int = 10,
    inner_iters: int = 60,
    reg_final_rel: float = 1e-4,
    polish_iters: int = 3000,
    tol: float = 1e-6,
) -> jax.Array:
    """Near-exact OT plan for GENERAL marginals, entirely on device.

    The jit-compatible counterpart of the host network simplex
    (native/emd.cc): log-domain Sinkhorn with a geometric ε-annealing
    schedule (warm-started potentials across phases, the classic ε-scaling
    trick), a tolerance-controlled polish loop at the final ε, then
    :func:`round_to_feasible`. The result has exact marginals; the transport
    cost error is dominated by the ε_final entropic bias plus the rounding
    of the residual marginal error — measured relative gap ≤ ~1.2e-3 vs the
    exact network simplex on random minibatch clouds up to 256×256 (see
    tests/test_coupling.py) — accurate enough for coupling resampling and
    W2 estimates where the reference uses ``pot.emd``
    (torchcfm/optimal_transport.py:87).

    Unlike :func:`sinkhorn`, supports n != m and non-uniform weights under
    ``jit`` — this is the traced-mode path of ``OTPlanSampler.get_map``.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    # Balance the marginal masses like the host path does (native.py
    # emd_solve rescales b): Sinkhorn fixed points and the rank-one rounding
    # both assume sum(a) == sum(b); unequal masses would otherwise yield a
    # plan violating the marginals by the mass ratio, silently and only in
    # traced mode.
    b = b * (jnp.sum(a) / jnp.maximum(jnp.sum(b), 1e-38))
    M = M.astype(jnp.float32)
    loga = jnp.log(jnp.maximum(a, 1e-38))
    logb = jnp.log(jnp.maximum(b, 1e-38))
    scale = jnp.maximum(jnp.max(M) - jnp.min(M), 1e-12)
    reg_final = scale * reg_final_rel
    # num_phases=1 means no annealing: the one executed phase (and the
    # polish) must run at reg_final itself, not at the warm-start reg0.
    reg0 = reg_final if num_phases <= 1 else scale / 4.0
    decay = (reg_final / reg0) ** (1.0 / jnp.maximum(num_phases - 1, 1))

    def phase(carry, _):
        f, g, reg = carry

        def inner(carry2, _):
            f, g = carry2
            f = reg * (loga - logsumexp((g[None, :] - M) / reg, axis=1))
            g = reg * (logb - logsumexp((f[:, None] - M) / reg, axis=0))
            return (f, g), None

        (f, g), _ = jax.lax.scan(inner, (f, g), None, length=inner_iters)
        return (f, g, reg * decay), None

    f0 = jnp.zeros_like(loga)
    g0 = jnp.zeros_like(logb)
    (f, g, reg_last), _ = jax.lax.scan(
        phase, (f0, g0, reg0), None, length=num_phases
    )
    reg_used = reg_last / decay  # reg of the final executed phase

    # Polish at the final ε until the pre-rounding row-marginal L1 error is
    # below tol (rounding moves ~err mass at ~max(M) cost each, so marginal
    # convergence — not ε — dominates the final cost gap).
    def polish_body(state):
        f, g, _, it = state
        f = reg_used * (loga - logsumexp((g[None, :] - M) / reg_used, axis=1))
        g = reg_used * (logb - logsumexp((f[:, None] - M) / reg_used, axis=0))
        log_plan = (f[:, None] + g[None, :] - M) / reg_used
        row = jnp.exp(logsumexp(log_plan, axis=1))
        err = jnp.sum(jnp.abs(row - a))
        return f, g, err, it + 1

    def polish_cond(state):
        _, _, err, it = state
        return jnp.logical_and(err > tol, it < polish_iters)

    f, g, _, _ = jax.lax.while_loop(
        polish_cond, polish_body, (f, g, jnp.asarray(jnp.inf), 0)
    )
    plan = jnp.exp((f[:, None] + g[None, :] - M) / reg_used)
    return round_to_feasible(plan, a, b)
