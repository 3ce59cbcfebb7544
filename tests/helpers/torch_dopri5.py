"""Independent dopri5 oracle in plain torch — torchdiffeq's algorithm,
re-implemented from the published method (Dormand & Prince 1980 tableau,
Hairer/Norsett/Wanner II.4 initial-step selection, standard step-size
controller), NOT from torchdiffeq's source (which is not in this image).

Role: the NFE/accuracy parity check the reference's FID protocol implies
(/root/reference/examples/images/cifar10/compute_fid.py:81-88 integrates
with torchdiffeq dopri5 at atol=rtol=1e-5) — tests/test_integrate.py
compares cfm_tpu.integrate._odeint_dopri5 against this oracle on shared
vector fields: NFE within +-10% and both solutions within tolerance of
closed forms.

Controller conventions mirrored from torchdiffeq's documented defaults:
safety 0.9, growth clamp [0.2, 10], error exponent -1/5, RMS error norm
with per-component scale atol + rtol*max(|y0|, |y1|), and accepted steps
never shrink (the decrease clamp is lifted to 1 when the error ratio is
below 1).
"""

from __future__ import annotations

from typing import Callable, Tuple

import torch

# Dormand-Prince 5(4) tableau (public knowledge; Hairer I, Table 5.2).
_C = [0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
_B4 = [
    5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
    -92097 / 339200, 187 / 2100, 1 / 40,
]


def _rms(x: torch.Tensor) -> torch.Tensor:
    return torch.sqrt(torch.mean(x * x))


def _initial_step(f, t0, y0, f0, rtol, atol, direction):
    """Hairer/Norsett/Wanner II.4 automatic initial step (2 extra evals)."""
    scale = atol + rtol * y0.abs()
    d0 = _rms(y0 / scale)
    d1 = _rms(f0 / scale)
    h0 = torch.where((d0 < 1e-5) | (d1 < 1e-5),
                     torch.tensor(1e-6, dtype=y0.dtype), 0.01 * d0 / d1)
    y1 = y0 + direction * h0 * f0
    f1 = f(t0 + direction * h0, y1)
    d2 = _rms((f1 - f0) / scale) / h0
    if d1 <= 1e-15 and d2 <= 1e-15:
        h1 = torch.maximum(torch.tensor(1e-6, dtype=y0.dtype), h0 * 1e-3)
    else:
        h1 = (0.01 / torch.maximum(d1, d2)) ** 0.2
    return torch.minimum(100 * h0, h1)


def dopri5(
    f: Callable[[torch.Tensor, torch.Tensor], torch.Tensor],
    y0: torch.Tensor,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 100000,
) -> Tuple[torch.Tensor, int, int]:
    """Integrate y' = f(t, y) from t0 to t1. Returns (y(t1), nfe, n_accepted).

    nfe counts every f evaluation: 1 (f0) + 2 (initial-step probe includes
    one extra beyond f0) + 6 per trial step (FSAL: k1 is the previous
    accepted step's k7; a rejected step re-uses the same k1).
    """
    direction = 1.0 if t1 >= t0 else -1.0
    t = torch.tensor(float(t0), dtype=y0.dtype)
    t_end = torch.tensor(float(t1), dtype=y0.dtype)
    y = y0.clone()
    f0 = f(t, y)
    nfe = 1
    h = _initial_step(f, t, y, f0, rtol, atol, direction)
    nfe += 1
    dt = direction * torch.minimum(h, (t_end - t).abs())
    k1 = f0
    accepted = 0
    for _ in range(max_steps):
        if (t_end - t).abs() <= 1e-10 * max(abs(t1), 1.0):
            break
        remaining = t_end - t
        if dt.abs() > remaining.abs():
            dt = remaining
        ks = [k1]
        for i in range(1, 7):
            yi = y.clone()
            for j, aij in enumerate(_A[i]):
                yi = yi + dt * aij * ks[j]
            ks.append(f(t + _C[i] * dt, yi))
        nfe += 6
        y5 = y.clone()
        y4 = y.clone()
        for i in range(7):
            y5 = y5 + dt * _B5[i] * ks[i]
            y4 = y4 + dt * _B4[i] * ks[i]
        err = y5 - y4
        scale = atol + rtol * torch.maximum(y.abs(), y5.abs())
        ratio = _rms(err / scale)
        accept = bool(ratio <= 1.0)
        dfactor = 1.0 if accept else 0.2  # accepted steps never shrink
        factor = torch.clamp(
            0.9 * ratio.clamp_min(1e-10) ** (-0.2), dfactor, 10.0
        )
        if accept:
            t = t + dt
            y = y5
            k1 = ks[6]  # FSAL
            accepted += 1
        dt = dt * factor
    return y, nfe, accepted
