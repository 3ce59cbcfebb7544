"""Fused GroupNorm(+SiLU) Pallas kernels — forward AND backward.

Device profiling of the CIFAR UNet forward (xplane trace, one v5e chip,
bs 128) shows where the time actually goes:

    fusion (normalize/silu/elementwise applies)   8.07 ms
    convert_reduce_fusion (bf16->fp32 GN stats)   6.20 ms
    convolutions                                  1.45 ms   <- NOT the convs!
    everything else                               ~1.2 ms

i.e. the fp32-GroupNorm chain (cast, two-pass stats, normalize, cast, silu)
is ~12 of the 17 ms forward. (A first microbenchmark suggested XLA's GN was
faster than this kernel — that measurement was invalid: slicing one output
element let XLA dead-code-eliminate the normalize/apply pass entirely.)

These kernels do the whole chain in single passes over VMEM-resident
blocks — fwd: read bf16 x once, fp32 group stats, normalize+affine+silu,
write bf16 once (plus channel-broadcast stat residuals); bwd: recompute norm
from x + saved stats, produce dx and accumulate dscale/dbias across the grid.

FINAL RESULT — NEGATIVE. In-model measurement (full UNet, bs128, v5e):
    XLA GN chain:    fwd 16.2 ms   fwd+bwd 44.7 ms
    these kernels:   fwd 22.0 ms   fwd+bwd 58.2 ms
Standalone the kernels are correct (grads match XLA autodiff to ~1e-2 rel in
a sum-of-sin stress test) and fast, but XLA fuses each GN chain INTO its
producer/consumer ops; pallas_call boundaries break those fusions and the
freed GN time comes back as extra standalone fusions. Lesson recorded for
future rounds: on TPU, Pallas pays off where XLA structurally cannot help
(the auction's sequential loop state living in VMEM across iterations), not
for normalization chains the fusion engine already absorbs. The model
therefore uses the plain jnp formula (models/unet.py GroupNorm32); these
kernels remain as the tested record of the experiment.

Mosaic notes: only 2D views (channels last) are used, and group reductions
are (C, G) one-hot matmuls — (HW, G, C/G) shape casts are rejected by
Mosaic's vector layout inference.

Numerics: statistics and the normalize/affine arithmetic are fp32 (same as
the reference's GroupNorm32, torchcfm/models/unet/nn.py:20-22).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot(c: int, num_groups: int):
    cg = c // num_groups
    chan_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    return (chan_ids // cg == group_ids).astype(jnp.float32)  # (C, G)


def _gn_silu_fwd_kernel(x_ref, scale_ref, bias_ref, out_ref, mean_ref, inv_ref,
                        *, num_groups: int, eps: float, apply_silu: bool):
    # Static-unrolled per-sample loop: every tensor op stays 2D (HW, C) —
    # Mosaic rejects the 3D broadcast/relayout patterns a batched
    # formulation needs, but 2D slices of a leading dim are fine.
    b = x_ref.shape[0]
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cg = c // num_groups
    onehot = _onehot(c, num_groups)
    cnt = float(h * w * cg)
    for j in range(b):
        xf = x_ref[j].astype(jnp.float32).reshape(h * w, c)
        colsum = jnp.sum(xf, axis=0, keepdims=True)          # (1, C)
        g_mean = jnp.dot(colsum, onehot, preferred_element_type=jnp.float32) / cnt
        mean_c = jnp.dot(g_mean, onehot.T, preferred_element_type=jnp.float32)
        # Two-pass variance (VMEM-resident): avoids E[x^2]-E[x]^2 cancellation.
        centered_sq = jnp.sum(jnp.square(xf - mean_c), axis=0, keepdims=True)
        g_var = jnp.dot(centered_sq, onehot, preferred_element_type=jnp.float32) / cnt
        g_inv = jax.lax.rsqrt(g_var + eps)
        inv_c = jnp.dot(g_inv, onehot.T, preferred_element_type=jnp.float32)

        y = (xf - mean_c) * inv_c * scale_ref[:] + bias_ref[:]
        out = y * jax.nn.sigmoid(y) if apply_silu else y
        out_ref[j] = out.reshape(h, w, c).astype(out_ref.dtype)
        mean_ref[j] = mean_c.reshape(1, 1, c)
        inv_ref[j] = inv_c.reshape(1, 1, c)


def _gn_silu_bwd_kernel(x_ref, scale_ref, bias_ref, mean_ref, inv_ref, g_ref,
                        dx_ref, dscale_ref, dbias_ref,
                        *, num_groups: int, apply_silu: bool):
    i = pl.program_id(0)
    b = x_ref.shape[0]
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cg = c // num_groups
    onehot = _onehot(c, num_groups)
    cnt = float(h * w * cg)
    scale = scale_ref[:]

    ds_acc = jnp.zeros((1, c), jnp.float32)
    db_acc = jnp.zeros((1, c), jnp.float32)
    for j in range(b):
        xf = x_ref[j].astype(jnp.float32).reshape(h * w, c)
        g = g_ref[j].astype(jnp.float32).reshape(h * w, c)
        mean_c = mean_ref[j].reshape(1, c)
        inv_c = inv_ref[j].reshape(1, c)
        norm = (xf - mean_c) * inv_c                     # (HW, C)
        if apply_silu:
            y = norm * scale + bias_ref[:]
            sig = jax.nn.sigmoid(y)
            dy = g * sig * (1.0 + y * (1.0 - sig))
        else:
            dy = g
        dnorm = dy * scale

        s1 = jnp.dot(jnp.sum(dnorm, 0, keepdims=True), onehot,
                     preferred_element_type=jnp.float32) / cnt
        s2 = jnp.dot(jnp.sum(dnorm * norm, 0, keepdims=True), onehot,
                     preferred_element_type=jnp.float32) / cnt
        s1_c = jnp.dot(s1, onehot.T, preferred_element_type=jnp.float32)
        s2_c = jnp.dot(s2, onehot.T, preferred_element_type=jnp.float32)
        dx = inv_c * (dnorm - s1_c - norm * s2_c)
        dx_ref[j] = dx.reshape(h, w, c).astype(dx_ref.dtype)

        ds_acc += jnp.sum(dy * norm, axis=0, keepdims=True)
        db_acc += jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dscale_ref[:] += ds_acc
    dbias_ref[:] += db_acc


def _batch_block(n: int, h: int, w: int, c: int, budget: int) -> int:
    """Largest power-of-two batch block whose live set fits VMEM.

    Mosaic stack-allocates ~6 (fwd) / ~10 (bwd) fp32 temporaries per
    unrolled sample plus double-buffered in/out blocks, so the nominal
    budget here is far below the 16 MB VMEM."""
    per_sample = h * w * c * 4
    b = max(1, budget // max(per_sample, 1))
    b = 1 << (b.bit_length() - 1)
    while n % b:
        b //= 2
    return max(b, 1)


def _gn_silu_fwd_pallas(x, scale, bias, num_groups: int, eps: float, apply_silu: bool):
    n, h, w, c = x.shape
    b = _batch_block(n, h, w, c, budget=2 * 1024 * 1024)
    kernel = functools.partial(
        _gn_silu_fwd_kernel, num_groups=num_groups, eps=eps, apply_silu=apply_silu
    )
    out, mean, inv = pl.pallas_call(
        kernel,
        grid=(n // b,),
        in_specs=[
            pl.BlockSpec((b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, 1, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, 1, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((n, 1, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1, c), jnp.float32),
        ),
    )(x, scale.reshape(1, c), bias.reshape(1, c))
    return out, mean, inv


def _gn_silu_bwd_pallas(x, scale, bias, mean, inv, g, num_groups: int, apply_silu: bool):
    n, h, w, c = x.shape
    kernel = functools.partial(
        _gn_silu_bwd_kernel, num_groups=num_groups, apply_silu=apply_silu
    )
    b = _batch_block(n, h, w, c, budget=512 * 1024)
    dx, dscale, dbias = pl.pallas_call(
        kernel,
        grid=(n // b,),
        in_specs=[
            pl.BlockSpec((b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, 1, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, 1, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
    )(x, scale.reshape(1, c), bias.reshape(1, c), mean, inv, g)
    return dx, dscale.reshape(c), dbias.reshape(c)


def _gn_silu_reference(x, scale, bias, num_groups: int, eps: float, apply_silu: bool):
    """Plain-XLA forward (CPU fallback; also the VJP oracle in tests)."""
    n, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(n, h * w, c)
    # Channels-last two-pass statistics. Round-2 experiments (xplane-
    # measured on v5e, documented in README "Where the step time goes")
    # tried (a) one-pass E[x^2]-E[x]^2 moments and (b) (n, hw, g, cg)
    # layouts — both perf-NEUTRAL because XLA already mega-fuses the whole
    # conv+GN+silu+stats chain at ~80% MXU peak. The recentered two-pass
    # form is kept because it is the numerically robust one (E[x^2]-E[x]^2
    # catastrophically cancels in f32 when |mean| >> std, and the Pallas
    # kernel in this file deliberately uses the recentered form too — the
    # fallback and the kernel must be the same function).
    s1 = jnp.mean(xf, axis=1)                              # (n, c)
    m1 = jnp.mean(s1.reshape(n, num_groups, cg), axis=-1)  # (n, g)
    mean_c = jnp.repeat(m1, cg, axis=-1)                   # (n, c)
    centered = xf - mean_c[:, None, :]
    s2 = jnp.mean(jnp.square(centered), axis=1)            # (n, c)
    var = jnp.mean(s2.reshape(n, num_groups, cg), axis=-1) # (n, g)
    rstd_c = jnp.repeat(jax.lax.rsqrt(var + eps), cg, axis=-1)
    norm = (centered * rstd_c[:, None, :]).reshape(n, h, w, c)
    out = norm * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_silu(x, scale, bias, num_groups: int = 32, eps: float = 1e-5,
                          apply_silu: bool = True):
    """silu(GroupNorm(x) * scale + bias) in one memory pass on TPU.

    x: (N, H, W, C) any float dtype; scale/bias: (C,). C % num_groups == 0.
    CPU falls back to the plain-XLA formula (identical numerics).
    """
    if jax.default_backend() == "cpu":
        return _gn_silu_reference(x, scale, bias, num_groups, eps, apply_silu)
    out, _, _ = _gn_silu_fwd_pallas(x, scale, bias, num_groups, eps, apply_silu)
    return out


def _fwd(x, scale, bias, num_groups, eps, apply_silu):
    if jax.default_backend() == "cpu":
        out = _gn_silu_reference(x, scale, bias, num_groups, eps, apply_silu)
        return out, (x, scale, bias, None, None)
    out, mean, inv = _gn_silu_fwd_pallas(x, scale, bias, num_groups, eps, apply_silu)
    return out, (x, scale, bias, mean, inv)


def _bwd(num_groups, eps, apply_silu, res, g):
    x, scale, bias, mean, inv = res
    if mean is None:  # CPU path: autodiff through the reference formula.
        def f(x, scale, bias):
            return _gn_silu_reference(x, scale, bias, num_groups, eps, apply_silu)

        _, vjp = jax.vjp(f, x, scale, bias)
        return vjp(g)
    return _gn_silu_bwd_pallas(x, scale, bias, mean, inv, g, num_groups, apply_silu)


fused_group_norm_silu.defvjp(_fwd, _bwd)
