"""ODE / SDE integration, fully jittable — the generation path of the framework.

TPU-native replacement for the reference's solver stack: torchdyn ``NeuralODE``
(/root/reference/runner/src/models/components/solver.py:184-216,
examples/images/cifar10/utils_cifar.py:42-73), ``torchdiffeq.odeint``
(examples/images/cifar10/compute_fid.py:81-88) and ``torchsde.sdeint``
(solver.py:157-182). Design:

- Fixed-step integrators (euler / midpoint / rk4 / heun) are a ``lax.scan``
  over the time grid: one compiled program, trivially ``vmap``/``pjit``-able,
  trajectory output for free as the scan ys.
- Adaptive dopri5 is a ``lax.while_loop`` with PI step-size control matching
  torchdiffeq's defaults (rtol=atol=1e-5 in the reference FID protocol,
  compute_fid.py:24,85-87).
- The SDE path is Euler–Maruyama with explicit PRNG key splitting per step and
  an optional Girsanov ``logqp`` KL accumulator carried through the scan
  (solver.py:169-179 semantics).
- NFE (number of function evaluations) is returned, never a Python counter —
  parity with the reference's NFE metric (solver.py:96,121-141) without
  breaking the trace.

All drift/diffusion callables use the framework signature ``f(t, x) -> dx``
with scalar ``t`` broadcast internally (models accept batched t; wrappers
below adapt).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
VectorField = Callable[[Array, Array], Array]  # (t_scalar, x) -> dx/dt


class ODESolution(NamedTuple):
    """Result of an ODE solve.

    ys:  trajectory, shape (T, *x.shape) — ys[i] is the state at ts[i].
         Fixed-step solvers take one step per grid interval; the adaptive
         dopri5 produces interior points by 4th-order dense output.
         With return_trajectory=False, (2, *x.shape): initial and final.
    nfe: number of vector-field evaluations (int32 scalar array).
    """

    ys: Array
    nfe: Array

    @property
    def final(self) -> Array:
        return jax.tree.map(lambda y: y[-1], self.ys)


class SDESolution(NamedTuple):
    ys: Array
    nfe: Array
    logqp: Optional[Array] = None

    @property
    def final(self) -> Array:
        return jax.tree.map(lambda y: y[-1], self.ys)


# --------------------------------------------------------------------------
# Fixed-step Runge-Kutta steppers
# --------------------------------------------------------------------------


# All steppers are pytree-aware: the state may be any pytree (e.g. the
# AugmentedState of cfm_tpu.augment carrying log-prob/regularizer channels).


def _axpy(x, k, a):
    """x + a * k over pytrees."""
    return jax.tree.map(lambda xi, ki: xi + a * ki, x, k)


def _euler_step(f: VectorField, t0, t1, x):
    dt = t1 - t0
    return _axpy(x, f(t0, x), dt), 1


def _midpoint_step(f: VectorField, t0, t1, x):
    dt = t1 - t0
    k1 = f(t0, x)
    k2 = f(t0 + dt / 2, _axpy(x, k1, dt / 2))
    return _axpy(x, k2, dt), 2


def _heun_step(f: VectorField, t0, t1, x):
    dt = t1 - t0
    k1 = f(t0, x)
    k2 = f(t1, _axpy(x, k1, dt))
    return _axpy(_axpy(x, k1, dt / 2), k2, dt / 2), 2


def _rk4_step(f: VectorField, t0, t1, x):
    dt = t1 - t0
    k1 = f(t0, x)
    k2 = f(t0 + dt / 2, _axpy(x, k1, dt / 2))
    k3 = f(t0 + dt / 2, _axpy(x, k2, dt / 2))
    k4 = f(t1, _axpy(x, k3, dt))
    out = jax.tree.map(
        lambda xi, a, b, c, d: xi + dt / 6 * (a + 2 * b + 2 * c + d),
        x, k1, k2, k3, k4,
    )
    return out, 4


_FIXED_STEPPERS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "heun": _heun_step,
    "rk4": _rk4_step,
}


def odeint(
    f: VectorField,
    x0: Array,
    ts: Array,
    method: str = "dopri5",
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 16384,
    return_trajectory: bool = True,
) -> ODESolution:
    """Integrate dx/dt = f(t, x) along the time grid ``ts``.

    ``ts`` is a 1-D array of times; integration runs segment by segment so
    monotonically decreasing grids (reverse-time CNF integration, reference
    runner/src/models/cfm_module.py:1412-1455) work unchanged.

    method: "euler" | "midpoint" | "heun" | "rk4" (fixed-step: one step per
    grid interval), "dopri5" adaptive (error controlled by rtol/atol; grid
    points are evaluation points only, matching ``torchdiffeq.odeint``
    semantics — dense output, best for trajectory rollouts), or "tsit5"
    adaptive (Tsitouras 5(4), torchdyn's other production solver; grid
    points are hit by step clamping — prefer for final-state integration).

    >>> import jax.numpy as jnp
    >>> sol = odeint(lambda t, x: -x, jnp.ones((3,)), jnp.linspace(0.0, 1.0, 11),
    ...              method="rk4")
    >>> sol.ys.shape          # trajectory: one row per grid point
    (11, 3)
    >>> bool(jnp.allclose(sol.final, jnp.exp(-1.0), atol=1e-6))
    True
    >>> int(sol.nfe)          # 4 evals per rk4 step x 10 intervals
    40
    >>> sol5 = odeint(lambda t, x: -x, jnp.ones((3,)), jnp.array([0.0, 1.0]),
    ...               method="dopri5", return_trajectory=False)
    >>> bool(jnp.allclose(sol5.final, jnp.exp(-1.0), atol=1e-4))
    True
    """
    ts = jnp.asarray(ts)
    if method in _FIXED_STEPPERS:
        stepper = _FIXED_STEPPERS[method]

        def scan_step(carry, t_pair):
            x, nfe = carry
            t0, t1 = t_pair
            x, n = stepper(f, t0, t1, x)
            return (x, nfe + n), x if return_trajectory else None

        t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
        (xT, nfe), ys = jax.lax.scan(
            scan_step, (x0, jnp.zeros((), jnp.int32)), t_pairs
        )
        if return_trajectory:
            ys = jax.tree.map(
                lambda x0i, ysi: jnp.concatenate([x0i[None], ysi], axis=0), x0, ys
            )
        else:
            ys = jax.tree.map(lambda a, b: jnp.stack([a, b], axis=0), x0, xT)
        return ODESolution(ys=ys, nfe=nfe)
    if method == "dopri5":
        return _odeint_dopri5(
            f, x0, ts, rtol=rtol, atol=atol, max_steps=max_steps,
            return_trajectory=return_trajectory,
        )
    if method == "tsit5":
        return _odeint_tsit5(
            f, x0, ts, rtol=rtol, atol=atol, max_steps=max_steps,
            return_trajectory=return_trajectory,
        )
    raise ValueError(f"Unknown ODE method: {method}")


# Dormand-Prince 5(4) Butcher tableau. Plain numpy ON PURPOSE: module-level
# jnp.array would initialize the XLA backend at import time, which breaks
# jax.distributed.initialize in multihost programs (parallel/mesh.py notes).
_DP_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
# Dense-output coefficients (Hairer & Wanner, "Solving ODEs I", DOPRI5
# contd5): the 4th-order continuous extension used by production dopri5
# implementations (torchdiffeq's interp_fit matches the same polynomial).
_DP_D = (
    -12715105075 / 11282082432,
    0.0,
    87487479700 / 32700410799,
    -10690763975 / 1880347072,
    701980252875 / 199316789632,
    -1453857185 / 822651844,
    69997945 / 29380423,
)
_DP_A = [
    np.array([]),
    np.array([1 / 5]),
    np.array([3 / 40, 9 / 40]),
    np.array([44 / 45, -56 / 15, 32 / 9]),
    np.array([19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]),
    np.array([9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]),
    np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]),
]
_DP_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def _dp_step_stages(f: VectorField, t, dt, x, k1):
    """One dopri5 trial step with FSAL (first-same-as-last) reuse; returns
    (x5, err, all 7 stages).

    Pytree-aware: x may be any pytree (e.g. AugmentedState), enabling
    adaptive integration of trace-augmented CNF states (the reference's
    torchdyn dopri5 + augmentation eval path, solver.py:184-216).
    """
    ks = [k1]
    for i in range(1, 7):
        xi = x
        for j, aij in enumerate(_DP_A[i]):
            xi = _axpy(xi, ks[j], dt * aij)
        ks.append(f(t + _DP_C[i] * dt, xi))
    x5 = x
    x4 = x
    for i in range(7):
        x5 = _axpy(x5, ks[i], dt * _DP_B5[i])
        x4 = _axpy(x4, ks[i], dt * _DP_B4[i])
    err = jax.tree.map(lambda a, b: a - b, x5, x4)
    return x5, err, ks


# --- Shared adaptive-step controller (used by dopri5 AND tsit5; fix once,
# --- both solvers get it).


def _rms_norm(tree):
    leaves = [jnp.sum(jnp.square(l)) for l in jax.tree.leaves(tree)]
    count = sum(l.size for l in jax.tree.leaves(tree))
    return jnp.sqrt(sum(leaves) / count)


def _err_ratio(err, x_new, x_old, rtol, atol):
    def leaf(e, a, b):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        return e / scale

    return _rms_norm(jax.tree.map(leaf, err, x_new, x_old))


def _hairer_initial_step(f, x0, f0, t0, t1, rtol, atol):
    """torchdiffeq ``_select_initial_step``: one extra eval beyond f0 (2
    startup evals total counting f0). Returns the signed initial dt."""
    direction = jnp.sign(t1 - t0)
    scale_tree = jax.tree.map(lambda y: atol + rtol * jnp.abs(y), x0)
    d0 = _rms_norm(jax.tree.map(lambda y, s: y / s, x0, scale_tree))
    d1 = _rms_norm(jax.tree.map(lambda k, s: k / s, f0, scale_tree))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = _axpy(x0, f0, direction * h0)
    f1 = f(t0 + direction * h0, y1)
    d2 = (
        _rms_norm(jax.tree.map(lambda a, b, s: (a - b) / s, f1, f0, scale_tree))
        / h0
    )
    # Exponent 0.2 = 1/(q+1) with q = 4 the ERROR-ESTIMATOR order of a 5(4)
    # pair (Hairer II.4; scipy RK45 uses error_estimator_order here and
    # torchdiffeq passes order-1 to _select_initial_step) — NOT 1/(p+1) of
    # the advancing order p=5.
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** 0.2,
    )
    return direction * jnp.minimum(jnp.minimum(100 * h0, h1), jnp.abs(t1 - t0))


def _pi_factor(e, accept):
    """Step-size factor: safety 0.9, err^(-1/5), clamp [dfactor, 10], with
    the torchdiffeq convention that an ACCEPTED step never shrinks the next
    trial (decrease clamp lifted to 1) — verified NFE-for-NFE against the
    independent torch oracle, tests/helpers/torch_dopri5.py."""
    dfactor = jnp.where(accept, 1.0, 0.2)
    return jnp.clip(0.9 * (1.0 / jnp.maximum(e, 1e-10)) ** 0.2, dfactor, 10.0)


def _odeint_dopri5(
    f: VectorField,
    x0: Array,
    ts: Array,
    rtol: float,
    atol: float,
    max_steps: int,
    return_trajectory: bool,
) -> ODESolution:
    """Adaptive dopri5 over the whole span with DENSE OUTPUT.

    ONE ``lax.while_loop`` integrates [ts[0], ts[-1]] (either direction);
    every interior grid point is produced by the 4th-order continuous
    extension (Hairer contd5 polynomial) of the accepted step that covers
    it — torchdiffeq ``odeint`` evaluation-point semantics
    (/root/reference/examples/images/cifar10/compute_fid.py:81-88 and the
    101-point rollout at runner/src/models/cfm_module.py:404), without the
    per-segment loop restart that would recompile 100 while loops.

    Step-size policy matches torchdiffeq's dopri5 defaults for NFE parity:
    Hairer initial-step selection (2 startup evals), safety 0.9, PI factor
    err^(-1/5), clamp [0.2, 10], RMS error norm over the full state.
    """
    T = ts.shape[0]
    t0, t1 = ts[0], ts[-1]

    f0 = f(t0, x0)
    dt0 = _hairer_initial_step(f, x0, f0, t0, t1, rtol, atol)
    nfe0 = jnp.asarray(2, jnp.int32)

    # --- Output buffer: (T, *state) per leaf, x0 written at index 0.
    # NaN-initialized so max_steps exhaustion is LOUD: torchdiffeq raises on
    # underflow/step-limit; under jit we cannot raise, so unreached grid
    # points stay NaN and propagate to any downstream metric instead of
    # silently reading as zeros.
    out0 = jax.tree.map(
        lambda l: jnp.full((T,) + l.shape, jnp.nan, l.dtype).at[0].set(l), x0
    )

    def interp_writes(out, t_prev, dt, x_prev, x_new, ks):
        """Write contd5(θ) into every grid point inside (t_prev, t_prev+dt]."""
        theta = (ts - t_prev) / dt  # (T,)
        mask = (theta > 0.0) & (theta <= 1.0 + 1e-7)

        def leaf(buf, y0, y1_, *ks_leaf):
            diff = y1_ - y0
            bspl = dt * ks_leaf[0] - diff
            # rcont5 = h * sum_i d_i k_i
            r5 = dt * sum(_DP_D[i] * ks_leaf[i] for i in range(7))
            # contd5: y0 + θ(diff + (1-θ)(bspl + θ((diff - h k7 - bspl) + (1-θ) r5)))
            r4 = diff - dt * ks_leaf[6] - bspl
            th = theta.reshape((T,) + (1,) * y0.ndim).astype(y0.dtype)
            val = y0 + th * (diff + (1 - th) * (bspl + th * (r4 + (1 - th) * r5)))
            m = mask.reshape((T,) + (1,) * y0.ndim)
            return jnp.where(m, val.astype(buf.dtype), buf)

        return jax.tree.map(leaf, out, x_prev, x_new, *ks)

    def cond(state):
        t, *_, steps, done = state
        return jnp.logical_and(~done, steps < max_steps)

    def body(state):
        t, x, dt, k1, out, nfe, steps, _ = state
        remaining = t1 - t
        dt = jnp.where(jnp.abs(dt) > jnp.abs(remaining), remaining, dt)
        x_new, err, ks = _dp_step_stages(f, t, dt, x, k1)
        e = _err_ratio(err, x_new, x, rtol, atol)
        accept = e <= 1.0
        dt_next = dt * _pi_factor(e, accept)
        out_new = interp_writes(out, t, dt, x, x_new, ks)
        out = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), out_new, out
        )
        t = jnp.where(accept, t + dt, t)
        x = jax.tree.map(lambda new, old: jnp.where(accept, new, old), x_new, x)
        k1 = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), ks[6], k1
        )
        done = jnp.abs(t1 - t) <= 1e-10 * jnp.maximum(jnp.abs(t1), 1.0)
        return (t, x, dt_next, k1, out, nfe + 6, steps + 1, done)

    _, x_f, _, _, out, nfe, _, done = jax.lax.while_loop(
        cond,
        body,
        (t0, x0, dt0, f0, out0, nfe0, jnp.zeros((), jnp.int32), jnp.asarray(False)),
    )
    # Exact final state (interpolation at θ=1 equals it analytically; this
    # guards the float boundary case where the last point's mask just missed).
    # Only when the integration actually REACHED t1 — a max_steps bailout
    # keeps the NaN so the failure cannot masquerade as a final sample.
    out = jax.tree.map(
        lambda buf, l: buf.at[-1].set(jnp.where(done, l, jnp.nan).astype(buf.dtype)),
        out,
        x_f,
    )
    if not return_trajectory:
        out = jax.tree.map(lambda buf: buf[jnp.array([0, T - 1])], out)
    return ODESolution(ys=out, nfe=nfe)


# Tsitouras 5(4) tableau (Tsitouras 2011, Table 1 — torchdyn's "tsit5"
# solver choice). FSAL 7-stage like DOPRI5; plain numpy for the same
# import-time reason as _DP_C above.
_TS_C = np.array([0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0])
_TS_A = (
    (),
    (0.161,),
    (-0.008480655492356989, 0.335480655492357),
    (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
    (5.325864828439257, -11.748883564062828, 7.4955393428898365,
     -0.09249506636175525),
    (5.86145544294642, -12.92096931784711, 8.159367898576159,
     -0.071584973281401, -0.028269050394068383),
    (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
     -3.290069515436081, 2.324710524099774),
)
_TS_B5 = (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742,
          -3.290069515436081, 2.324710524099774, 0.0)
# Error weights: b(5th) - bhat(4th); err = h * sum_i btilde_i k_i.
_TS_BT = (-0.00178001105222577714, -0.0008164344596567469,
          0.007880878010261995, -0.1447110071732629, 0.5823571654525552,
          -0.45808210592918697, 0.015151515151515152)


def _ts_step_stages(f, t, dt, x, k1):
    """One tsit5 trial step with FSAL; returns (x5, err_tree, all 7 stages)."""
    ks = [k1]
    for i in range(1, 7):
        xi = x
        for j, aij in enumerate(_TS_A[i]):
            xi = _axpy(xi, ks[j], dt * aij)
        ks.append(f(t + _TS_C[i] * dt, xi))
    x5 = x
    for i in range(7):
        if _TS_B5[i]:
            x5 = _axpy(x5, ks[i], dt * _TS_B5[i])
    err = jax.tree.map(
        lambda *kl: dt * sum(_TS_BT[i] * kl[i] for i in range(7)), *ks
    )
    return x5, err, ks


def _odeint_tsit5(
    f: VectorField,
    x0: Array,
    ts: Array,
    rtol: float,
    atol: float,
    max_steps: int,
    return_trajectory: bool,
) -> ODESolution:
    """Adaptive Tsitouras 5(4) over the whole span.

    Same controller as the dopri5 path (Hairer initial step, safety 0.9,
    err^(-1/5), torchdiffeq accepted-steps-never-shrink convention), but
    grid points are hit by CLAMPING the step to land on them exactly — no
    continuous extension (tsit5's free interpolant is method-specific), so
    dense grids cost extra step restarts. Measured guidance: on smooth
    fields tsit5 needs ~10% fewer NFE than dopri5 (50 vs 56 on linear decay
    at 1e-5), but on the bf16 CIFAR UNet at the FID protocol's 1e-5 its
    step control settles on much smaller steps (1166 vs 182 NFE measured on
    v5e, same final samples to ~1e-3) — keep dopri5 for bf16 neural fields
    and trajectory rollouts; tsit5 completes torchdyn's solver menu
    (reference solver.py ode_solver choices) for smooth/analytic problems.
    """
    T = ts.shape[0]
    t0, t1 = ts[0], ts[-1]
    direction = jnp.sign(t1 - t0)

    f0 = f(t0, x0)
    dt0 = _hairer_initial_step(f, x0, f0, t0, t1, rtol, atol)
    nfe0 = jnp.asarray(2, jnp.int32)

    # NaN-initialized for the same loud-failure semantics as the dopri5 path.
    out0 = jax.tree.map(
        lambda l: jnp.full((T,) + l.shape, jnp.nan, l.dtype).at[0].set(l), x0
    )

    def cond(state):
        *_, steps, done = state
        return jnp.logical_and(~done, steps < max_steps)

    def body(state):
        t, x, dt, k1, out, idx, nfe, steps, _ = state
        t_out = ts[idx]                      # next pending output time
        remaining = t_out - t
        dt_c = jnp.where(jnp.abs(dt) > jnp.abs(remaining), remaining, dt)
        x_new, err, ks = _ts_step_stages(f, t, dt_c, x, k1)
        e = _err_ratio(err, x_new, x, rtol, atol)
        accept = e <= 1.0
        factor = _pi_factor(e, accept)
        t = jnp.where(accept, t + dt_c, t)
        x = jax.tree.map(lambda nw, od: jnp.where(accept, nw, od), x_new, x)
        k1 = jax.tree.map(lambda nw, od: jnp.where(accept, nw, od), ks[6], k1)
        landed = accept & (jnp.abs(t_out - t)
                           <= 1e-10 * jnp.maximum(jnp.abs(t_out), 1.0))
        out = jax.tree.map(
            lambda buf, l: jnp.where(landed, buf.at[idx].set(l), buf), out, x
        )
        idx = jnp.where(landed, jnp.minimum(idx + 1, T - 1), idx)
        done = landed & (idx == T - 1) & (
            jnp.abs(t1 - t) <= 1e-10 * jnp.maximum(jnp.abs(t1), 1.0))
        # Next trial step. On an ACCEPTED step the controller must not lose
        # its step size to grid clamping: a landing clamped to dt_c << dt
        # (or exactly 0 on duplicate grid entries) has tiny error, and
        # dt_c * factor would propose a poisoned-small (or permanently zero)
        # next step — the controller keeps max(|dt|, |dt_c * factor|). On a
        # REJECTED step dt_c is what actually failed, so shrink from it.
        dt_next = jnp.where(
            accept,
            direction * jnp.maximum(jnp.abs(dt), jnp.abs(dt_c * factor)),
            dt_c * factor,
        )
        return (t, x, dt_next, k1, out, idx, nfe + 6, steps + 1, done)

    init = (t0, x0, dt0, f0, out0, jnp.asarray(1, jnp.int32), nfe0,
            jnp.zeros((), jnp.int32), jnp.asarray(False))
    _, x_f, _, _, out, _, nfe, _, done = jax.lax.while_loop(cond, body, init)
    out = jax.tree.map(
        lambda buf, l: buf.at[-1].set(jnp.where(done, l, jnp.nan).astype(buf.dtype)),
        out,
        x_f,
    )
    if not return_trajectory:
        out = jax.tree.map(lambda buf: buf[jnp.array([0, T - 1])], out)
    return ODESolution(ys=out, nfe=nfe)


# --------------------------------------------------------------------------
# SDE integration (Euler–Maruyama)
# --------------------------------------------------------------------------


def sdeint(
    drift: VectorField,
    diffusion: Callable[[Array, Array], Array],
    key: Array,
    x0: Array,
    ts: Array,
    logqp_drift: Optional[VectorField] = None,
    return_trajectory: bool = True,
    method: str = "euler",
) -> SDESolution:
    """SDE integration of dx = drift dt + diffusion dW.

    ``method``: "euler" (Euler–Maruyama, the reference's default
    ``sde_solver`` at solver.py:56) or "heun" (stochastic Heun /
    predictor-corrector: drift and diffusion averaged between the start
    point and an EM predictor, 2 NFE/step). For the additive sigma(t)
    noise this framework integrates (bridge sampling, SF2M), Ito and
    Stratonovich coincide, so "heun" is unambiguous and cuts the drift
    discretization bias from O(dt) to O(dt^2) — measured in
    tests/test_integrate.py::test_sdeint_heun_less_biased_than_euler.

    ``diffusion(t, x)`` returns the *diagonal* noise scale (any shape
    broadcastable to x) — parity with the reference's diagonal-noise SDE
    adapter (solver.py:17-44). Reverse-time integration is expressed by a
    decreasing ``ts`` (dt < 0); the Brownian increment variance uses |dt|.

    ``logqp_drift``: if given, accumulates the Girsanov KL estimate
    0.5 ∫ ||(drift - logqp_drift) / diffusion||^2 dt as in torchsde's
    ``logqp=True`` (used by SF2M eval, cfm_module.py:946-966).
    """
    if method not in ("euler", "heun"):
        raise ValueError(f"Unknown SDE method: {method}")
    ts = jnp.asarray(ts)
    n_steps = ts.shape[0] - 1
    keys = jax.random.split(key, n_steps)

    def scan_step(carry, inp):
        x, nfe, kl = carry
        t0, t1, k = inp
        dt = t1 - t0
        sqrt_dt = jnp.sqrt(jnp.abs(dt))
        dw = jax.random.normal(k, x.shape, x.dtype) * sqrt_dt
        fx = drift(t0, x)
        gx = diffusion(t0, x)
        # The update arithmetic promotes to f32 (dt is the ts dtype); cast
        # back so bf16 states keep a bf16 scan carry.
        if method == "heun":
            x_pred = (x + fx * dt + gx * dw).astype(x.dtype)
            x_new = (
                x
                + 0.5 * (fx + drift(t1, x_pred)) * dt
                + 0.5 * (gx + diffusion(t1, x_pred)) * dw
            ).astype(x.dtype)
            nfe = nfe + 2
        else:
            x_new = (x + fx * dt + gx * dw).astype(x.dtype)
            nfe = nfe + 1
        if logqp_drift is not None:
            hx = logqp_drift(t0, x)
            # Accumulate in f32 regardless of the state dtype: a bf16 KL
            # carry stalls once |kl| outgrows bf16 spacing over long rollouts.
            u = ((fx - hx) / jnp.maximum(jnp.abs(gx), 1e-8)).astype(jnp.float32)
            axes = tuple(range(1, x.ndim))
            kl = kl + 0.5 * jnp.sum(jnp.square(u), axis=axes) * jnp.abs(
                dt
            ).astype(jnp.float32)
        return (x_new, nfe, kl), x_new if return_trajectory else None

    kl0 = (
        jnp.zeros(x0.shape[0], jnp.float32)
        if logqp_drift is not None
        else jnp.zeros(())
    )
    (xT, nfe, kl), ys = jax.lax.scan(
        scan_step,
        (x0, jnp.zeros((), jnp.int32), kl0),
        (ts[:-1], ts[1:], keys),
    )
    if return_trajectory:
        ys = jnp.concatenate([x0[None], ys], axis=0)
    else:
        ys = jnp.stack([x0, xT], axis=0)
    return SDESolution(ys=ys, nfe=nfe, logqp=kl if logqp_drift is not None else None)


# --------------------------------------------------------------------------
# Reverse-differentiable adaptive integration: the continuous adjoint
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6))
def odeint_adjoint(
    f: Callable[[Any, Array, Any], Any],
    params: Any,
    x0: Any,
    ts: Array,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 16384,
):
    """Adaptive dopri5 you can train THROUGH: optimize-then-discretize.

    ``lax.while_loop`` is not reverse-differentiable, so plain
    ``odeint(..., method="dopri5")`` is eval-only. This entry point closes
    that boundary (the reference trains through torchdyn's adjoint,
    runner/src/models/components/solver.py:192-216) with the continuous
    adjoint method: the VJP integrates the augmented system
    (x, a = dL/dx, g = dL/dparams) BACKWARD with the same while_loop dopri5 —
    da/dt = -a^T df/dx, dg/dt = -a^T df/dparams — so memory is O(state), not
    O(NFE), and both passes are error-controlled at (rtol, atol).

    ``f(params, t, x)`` is the drift (params explicit so their cotangent can
    be accumulated); ``x0`` may be any pytree (e.g. a trace-augmented CNF
    state). Returns the FINAL state only — for dense differentiable output
    use the fixed-step scan solvers; for dense non-differentiable output use
    ``odeint``. Gradients are w.r.t. ``params`` and ``x0``; the time grid is
    treated as constant. Note the classic adjoint caveat applies: x(t) is
    reconstructed by integrating backward, so gradients are approximate at
    loose tolerances (checked to ~1e-3 of discretize-then-optimize at 1e-6,
    tests/test_integrate.py::test_odeint_adjoint_matches_discretize_grads).
    """
    sol = _odeint_dopri5(
        lambda t, x: f(params, t, x), x0, jnp.asarray(ts),
        rtol, atol, max_steps, return_trajectory=False,
    )
    return jax.tree.map(lambda b: b[-1], sol.ys)


def _odeint_adjoint_fwd(f, params, x0, ts, rtol, atol, max_steps):
    out = odeint_adjoint(f, params, x0, ts, rtol, atol, max_steps)
    return out, (params, out, jnp.asarray(ts))


def _odeint_adjoint_bwd(f, rtol, atol, max_steps, res, g):
    params, x_final, ts = res

    def aug_dyn(t, state):
        x, a, _ = state
        fx, vjp = jax.vjp(lambda xx, pp: f(pp, t, xx), x, params)
        da, dp = vjp(a)
        return (
            fx,
            jax.tree.map(jnp.negative, da),
            jax.tree.map(jnp.negative, dp),
        )

    aug0 = (x_final, g, jax.tree.map(jnp.zeros_like, params))
    ts_back = jnp.stack([ts[-1], ts[0]])
    sol = _odeint_dopri5(aug_dyn, aug0, ts_back, rtol, atol, max_steps,
                         return_trajectory=False)
    _, a0, gp = jax.tree.map(lambda b: b[-1], sol.ys)
    return (gp, a0, jnp.zeros_like(ts))


odeint_adjoint.defvjp(_odeint_adjoint_fwd, _odeint_adjoint_bwd)


# --------------------------------------------------------------------------
# Model-signature adapters
# --------------------------------------------------------------------------


def vector_field_from_model(apply_fn, params, y: Optional[Array] = None) -> VectorField:
    """Adapt ``apply(params, t_batch, x[, y]) -> v`` to the (t_scalar, x) drift.

    Counterpart of the reference's ``torch_wrapper`` (torchcfm/utils.py:44-52):
    broadcasts scalar integration time to a per-sample batch vector.
    """

    def f(t, x):
        t_b = jnp.full((x.shape[0],), t, x.dtype)
        if y is not None:
            return apply_fn(params, t_b, x, y)
        return apply_fn(params, t_b, x)

    return f


@dataclasses.dataclass
class FlowSolver:
    """Unified ODE/SDE generation facade over a trained vector field.

    Mirror of the reference ``FlowSolver`` (runner/src/models/components/
    solver.py:47-222): ``odeint`` rolls out the learned drift; ``sdeint``
    combines drift + score into the SDE  dx = [v + s] dt + sigma dW  (forward)
    or dx = [-v + s] dt + sigma dW on the reversed field (reverse flag),
    with optional logqp KL.
    """

    drift: VectorField
    score: Optional[VectorField] = None
    sigma: Union[float, Callable[[Array], Array]] = 0.0
    ode_method: str = "dopri5"
    sde_solver: str = "euler"
    rtol: float = 1e-5
    atol: float = 1e-5

    def _sigma_fn(self):
        sig = self.sigma
        if callable(sig):
            # Broadcast like the reference TorchSDE.g (sigma(t) *
            # ones_like(y), solver.py:40-44): schedules returning () or
            # (1,)-shaped values are both fine.
            return lambda t, x: jnp.asarray(sig(t)).reshape(()) * jnp.ones_like(x)

        return lambda t, x: jnp.asarray(sig, x.dtype) * jnp.ones_like(x)

    def odeint(self, x0: Array, ts: Array, **kw) -> ODESolution:
        method = kw.pop("method", self.ode_method)
        return odeint(self.drift, x0, ts, method=method, rtol=self.rtol, atol=self.atol, **kw)

    def sdeint(
        self,
        key: Array,
        x0: Array,
        ts: Array,
        reverse: bool = False,
        logqp: bool = False,
        **kw,
    ) -> SDESolution:
        if self.score is None:
            raise ValueError("sdeint requires a score field")
        if logqp and not callable(self.sigma) and float(self.sigma) == 0.0:
            # Girsanov KL divides by the diffusion; with sigma = 0 the
            # epsilon floor would return an astronomically large finite
            # number instead of the honest answer (undefined).
            raise ValueError(
                "logqp KL is undefined for sigma=0 — set FlowSolver.sigma "
                "(or a noise schedule) before requesting logqp"
            )
        v, s = self.drift, self.score
        if reverse:
            drift = lambda t, x: -v(1.0 - t, x) + s(1.0 - t, x)
        else:
            drift = lambda t, x: v(t, x) + s(t, x)
        logqp_drift = (lambda t, x: jnp.zeros_like(x)) if logqp else None
        kw.setdefault("method", self.sde_solver)
        return sdeint(
            drift, self._sigma_fn(), key, x0, ts, logqp_drift=logqp_drift, **kw
        )
