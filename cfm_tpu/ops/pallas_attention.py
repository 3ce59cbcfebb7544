"""Fused multi-head self-attention Pallas kernel for the UNet's 16x16 blocks.

The XLA composition of AttentionBlock (models/unet.py) materializes the
f32 (N, H, S, S) logits and softmax weights in HBM — at the CIFAR recipe's
bs128 / 4 heads / S=256 that is a 134 MB logits tensor plus a 67 MB weights
tensor per block, written and re-read in forward AND backward (xplane trace:
the softmax fusions alone are ~3.4 ms of the 49 ms train step, plus the
qkv-transpose copies). The whole per-batch problem (all heads) is only
~400 KB, so the kernel grids over the batch alone and keeps every head's
q/k/v, logits and softmax VMEM-resident — flash-attention-style, with a
recompute-based backward that saves NO residuals at all (traffic: read
qkv + do, write dqkv; zero O(S^2) HBM tensors). Batch-only cells beat
(batch, head) cells by 1.4x in-model (4.0 vs 5.5 ms/step over 5 blocks):
4x fewer grid iterations and 4x larger DMAs. The remaining 4.0 ms is
VPU-bound on the softmax exp (measured: transcendental throughput, not
HBM, is the wall for exp/sigmoid chains on v5e) — near the floor for this
op count.

Numerics match the XLA path (tests/test_models.py): logits accumulated in
f32 (MXU native), softmax in f32, weights cast to the model dtype before
the value matmul — the same dtype contract as the jnp composition
(reference QKVAttention, unet.py:237-366, computes fp32 softmax in fp16
nets via GroupNorm32-style upcasting).

CPU (and any non-TPU backend) falls back to the identical-math jnp
composition, so tests pin the kernel's semantics everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_reference(qkv: jax.Array, scale: float) -> jax.Array:
    """Plain-XLA forward: qkv (N, S, 3, H, D) -> out (N, S, H, D)."""
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", w, v)


# Softmax exp variant, settable for A/B measurement (tools/attn_softmax_bench
# .py — VERDICT r3 item 7a): "exp" = f32 jnp.exp (default, the numerics the
# tests pin); "exp2" = exp2(x * log2 e) in f32 (TPU's exp lowers through
# exp2, so this removes one multiply if the compiler wasn't already folding
# it); "bf16" = exp evaluated on bf16 inputs (halves exp input width; VPU
# transcendentals are f32-rate on v5e so this mainly tests conversion cost).
SOFTMAX_EXP = "exp"
_LOG2E = 1.4426950408889634


def _softmax_unnormalized(logits, m):
    """exp(logits - m) under the selected SOFTMAX_EXP variant, f32 out."""
    x = logits - m
    if SOFTMAX_EXP == "exp2":
        return jnp.exp2(x * _LOG2E)
    if SOFTMAX_EXP == "bf16":
        return jnp.exp(x.astype(jnp.bfloat16)).astype(jnp.float32)
    return jnp.exp(x)


def _fwd_kernel(qkv_ref, o_ref, *, scale, n_heads):
    # qkv_ref block: (1, 3, H, S, D) — (S, D) matrices land on the native
    # (sublane, lane) tiles; loop heads with static indices so the whole
    # per-batch problem stays VMEM-resident (S=256, H=4, D=64 -> 393KB).
    for h in range(n_heads):
        q = qkv_ref[0, 0, h].astype(jnp.float32)          # (S, D)
        k = qkv_ref[0, 1, h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                         # (S, S)
        m = jnp.max(logits, axis=1, keepdims=True)
        w = _softmax_unnormalized(logits, m)
        denom = jnp.sum(w, axis=1, keepdims=True)
        w = (w / denom).astype(o_ref.dtype)               # softmax, model dtype
        o_ref[0, h] = jax.lax.dot_general(
            w, qkv_ref[0, 2, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, scale, n_heads):
    for h in range(n_heads):
        q = qkv_ref[0, 0, h].astype(jnp.float32)
        k = qkv_ref[0, 1, h].astype(jnp.float32)
        v = qkv_ref[0, 2, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=1, keepdims=True)
        e = _softmax_unnormalized(logits, m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        wf = e / denom                                    # f32 softmax
        # Forward casts w to model dtype before the value matmul; mirror that
        # here so gradients are for the same function the forward computes.
        w = wf.astype(do_ref.dtype).astype(jnp.float32)
        dv = jax.lax.dot_general(
            w, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )                                                 # (S_k, D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                 # (S_q, S_k)
        dw = dp - jnp.sum(dp * w, axis=1, keepdims=True)
        ds = wf * dw * scale                              # d logits
        dqkv_ref[0, 0, h] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, 1, h] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, 2, h] = dv.astype(dqkv_ref.dtype)


# Test hook: when True, run the Pallas kernels in interpret mode on any
# backend so CPU CI pins the kernel math itself, not just the fallback.
INTERPRET = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_attention(qkv: jax.Array, scale: float) -> jax.Array:
    """Multi-head self-attention: qkv (N, S, 3, H, D) -> (N, S, H, D).

    On TPU, a Pallas kernel gridded over the batch with the whole per-batch
    problem (all heads' q/k/v + the (S, S) attention matrix) VMEM-resident;
    elsewhere, the identical-math jnp composition. S and D should be
    multiples of the vector lane/sublane tiles (S=256, D=64 in the UNet) --
    other shapes fall back to XLA. The head axis must sit OUTSIDE the
    trailing two block dims (TPU blocks' last two dims must be 8/128-
    divisible or equal to the array dims), hence the (N, 3, H, S, D) layout.
    """
    return _fused_attention_fwd_impl(qkv, scale)


# Per-grid-cell VMEM budget: TPU VMEM is ~16 MB; leave headroom for the
# compiler's own scratch/pipelining. The batch-gridded kernel's residency
# scales with H (all heads' q/k/v + output live per cell) so the gate must
# bound the footprint, not just check tile alignment — e.g. H=32, S=1024,
# D=64 bf16 is alignment-legal but needs ~30 MB and fails Mosaic compilation.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _vmem_bytes(H: int, S: int, D: int, itemsize: int) -> int:
    """Worst-case (backward) per-cell residency: qkv in + dqkv out + do
    (7*H*S*D in the model dtype), plus the f32 (S, S) logits/softmax/dp
    working set (~3 simultaneously live) and f32 q/k/v/do head copies."""
    return itemsize * 7 * H * S * D + 4 * (3 * S * S + 4 * S * D)


def _gate(H: int, S: int, D: int, dtype) -> bool:
    """Shared Pallas-vs-XLA routing for BOTH qkv layouts: tile alignment,
    VMEM footprint, and backend."""
    aligned = S % 128 == 0 and D % 64 == 0
    fits = _vmem_bytes(H, S, D, dtype.itemsize) <= _VMEM_BUDGET_BYTES
    return aligned and fits and (
        INTERPRET or jax.default_backend() in ("tpu", "axon")
    )


def _use_pallas(qkv) -> bool:
    N, S, three, H, D = qkv.shape
    return _gate(H, S, D, qkv.dtype)


def _fused_attention_fwd_impl(qkv, scale):
    if not _use_pallas(qkv):
        return _attn_reference(qkv, scale)
    N, S, _, H, D = qkv.shape
    # (N, S, 3, H, D) -> (N, 3, H, S, D): one fusable transpose; (S, D)
    # matrices then sit on the native (sublane, lane) tiles.
    qkv_r = qkv.transpose(0, 2, 3, 1, 4)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_heads=H),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, S, D), lambda b: (b, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, S, D), qkv.dtype),
        interpret=INTERPRET,
    )(qkv_r)
    return out.transpose(0, 2, 1, 3)                      # (N, S, H, D)


def _fused_attention_vjp_fwd(qkv, scale):
    return _fused_attention_fwd_impl(qkv, scale), qkv


def _fused_attention_vjp_bwd(scale, qkv, g):
    if not _use_pallas(qkv):
        _, vjp = jax.vjp(lambda a: _attn_reference(a, scale), qkv)
        return (vjp(g)[0],)
    N, S, _, H, D = qkv.shape
    qkv_r = qkv.transpose(0, 2, 3, 1, 4)                  # (N, 3, H, S, D)
    g_r = g.reshape(N, S, H, D).transpose(0, 2, 1, 3)     # (N, H, S, D)
    dqkv_r = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_heads=H),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 3, H, S, D), lambda b: (b, 0, 0, 0, 0)),
            pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, H, S, D), lambda b: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 3, H, S, D), qkv.dtype),
        interpret=INTERPRET,
    )(qkv_r, g_r)
    return (dqkv_r.transpose(0, 3, 1, 2, 4),)             # (N, S, 3, H, D)


fused_attention.defvjp(_fused_attention_vjp_fwd, _fused_attention_vjp_bwd)


# ---------------------------------------------------------------------------
# Kernel-layout entry point: (N, 3, H, S, D) in -> (N, H, S, D) out, no
# transposes. The UNet's AttentionBlock produces/consumes these layouts
# directly via einsum projections (qkv in-proj emits nkhsd, out-proj
# contracts nhsd), so the layout copies the (N, S, 3, H, D) API pays for
# (~5.7 ms/step of copy ops profiled at bs128, ROADMAP #4) never exist —
# XLA folds the layout into the projection matmuls' output/input maps.
# ---------------------------------------------------------------------------


def _attn_reference_t(qkv_t: jax.Array, scale: float) -> jax.Array:
    """Plain-XLA twin on the kernel layout: (N, 3, H, S, D) -> (N, H, S, D)."""
    q, k, v = qkv_t[:, 0], qkv_t[:, 1], qkv_t[:, 2]
    logits = jnp.einsum(
        "nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(qkv_t.dtype)
    return jnp.einsum("nhqk,nhkd->nhqd", w, v)


def _use_pallas_t(qkv_t) -> bool:
    N, three, H, S, D = qkv_t.shape
    return _gate(H, S, D, qkv_t.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_attention_t(qkv_t: jax.Array, scale: float) -> jax.Array:
    """Multi-head self-attention, kernel layout: (N, 3, H, S, D) -> (N, H, S, D).

    Same math and same Pallas kernels as ``fused_attention`` (which is this
    function plus two transposes); use this when the producer/consumer can
    emit/accept the kernel layout directly (models/unet.py AttentionBlock).
    """
    return _fused_attention_t_fwd_impl(qkv_t, scale)


def _fused_attention_t_fwd_impl(qkv_t, scale):
    if not _use_pallas_t(qkv_t):
        return _attn_reference_t(qkv_t, scale)
    N, _, H, S, D = qkv_t.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_heads=H),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 3, H, S, D), lambda b: (b, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, S, D), qkv_t.dtype),
        interpret=INTERPRET,
    )(qkv_t)


def _fused_attention_t_vjp_fwd(qkv_t, scale):
    return _fused_attention_t_fwd_impl(qkv_t, scale), qkv_t


def _fused_attention_t_vjp_bwd(scale, qkv_t, g):
    if not _use_pallas_t(qkv_t):
        _, vjp = jax.vjp(lambda a: _attn_reference_t(a, scale), qkv_t)
        return (vjp(g)[0],)
    N, _, H, S, D = qkv_t.shape
    dqkv_t = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_heads=H),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 3, H, S, D), lambda b: (b, 0, 0, 0, 0)),
            pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, H, S, D), lambda b: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 3, H, S, D), qkv_t.dtype),
        interpret=INTERPRET,
    )(qkv_t, g)
    return (dqkv_t,)


fused_attention_t.defvjp(_fused_attention_t_vjp_fwd, _fused_attention_t_vjp_bwd)
