"""Fused multi-head self-attention Pallas kernel for the UNet's 16x16 blocks.

The XLA composition of AttentionBlock (models/unet.py) materializes the
f32 (N, H, S, S) logits and softmax weights in HBM — at the CIFAR recipe's
bs128 / 4 heads / S=256 that is a 134 MB logits tensor plus a 67 MB weights
tensor per block, written and re-read in forward AND backward (xplane trace:
the softmax fusions alone are ~3.4 ms of the 49 ms train step, plus the
qkv-transpose copies). The whole per-(batch, head) problem is only
(256, 64), so here each grid cell keeps q/k/v, the logits and the softmax
entirely in VMEM and writes only the (S, D) output — flash-attention-style,
with a recompute-based backward that saves NO residuals at all (traffic:
read qkv + do, write dqkv; zero O(S^2) HBM tensors).

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


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)                      # (S, D)
    k = k_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                             # (S, S)
    m = jnp.max(logits, axis=1, keepdims=True)
    w = jnp.exp(logits - m)
    denom = jnp.sum(w, axis=1, keepdims=True)
    w = (w / denom).astype(o_ref.dtype)                   # softmax, model dtype
    o_ref[0] = jax.lax.dot_general(
        w, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    wf = e / denom                                        # f32 softmax
    # Forward casts w to model dtype before the value matmul; mirror that
    # here so gradients are for the same function the forward computes.
    w = wf.astype(do_ref.dtype).astype(jnp.float32)
    dv = jax.lax.dot_general(
        w, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # (S_k, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # (S_q, S_k)
    dw = dp - jnp.sum(dp * w, axis=1, keepdims=True)
    ds = wf * dw * scale                                  # d logits
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# Test hook: when True, run the Pallas kernels in interpret mode on any
# backend so CPU CI pins the kernel math itself, not just the fallback.
INTERPRET = False


def _qkv_specs(S: int, H: int, D: int):
    """Three views into qkv laid out (N, 3H, S, D): q/k/v for head h live at
    second-dim blocks h, H + h, 2H + h. The head axis must sit OUTSIDE the
    trailing two dims: TPU Pallas requires a block's last two dims to be
    (8k, 128k) or equal to the array dims, so a size-1 head block there is
    illegal — (1, 1, S, D) with head in dim 1 is the legal layout."""
    return [
        pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, S, D), lambda b, h: (b, H + h, 0, 0)),
        pl.BlockSpec((1, 1, S, D), lambda b, h: (b, 2 * H + h, 0, 0)),
    ]


def _squeeze_kernel(kernel):
    """Adapt (1, 1, S, D)-block refs to the (1, S, D) the kernels index."""

    class _View:
        def __init__(self, ref):
            self._ref = ref
            self.dtype = ref.dtype

        def __getitem__(self, idx):
            assert idx == 0
            return self._ref[0, 0]

        def __setitem__(self, idx, val):
            assert idx == 0
            self._ref[0, 0] = val

    def wrapped(*refs, **kw):
        return kernel(*[_View(r) for r in refs], **kw)

    return wrapped


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_attention(qkv: jax.Array, scale: float) -> jax.Array:
    """Multi-head self-attention: qkv (N, S, 3, H, D) -> (N, S, H, D).

    On TPU, a Pallas kernel gridded over (batch, head) with the whole
    (S, S) attention matrix VMEM-resident; elsewhere, the identical-math
    jnp composition. S and D should be multiples of the vector lane/sublane
    tiles (S=256, D=64 in the UNet) — other shapes fall back to XLA.
    """
    return _fused_attention_fwd_impl(qkv, scale)


def _use_pallas(qkv) -> bool:
    N, S, three, H, D = qkv.shape
    aligned = S % 128 == 0 and D % 64 == 0
    return aligned and (INTERPRET or jax.default_backend() in ("tpu", "axon"))


def _fused_attention_fwd_impl(qkv, scale):
    if not _use_pallas(qkv):
        return _attn_reference(qkv, scale)
    N, S, _, H, D = qkv.shape
    # (N, S, 3, H, D) -> (N, 3H, S, D): one fusable transpose so the head
    # axis is outside the (S, D) block dims (see _qkv_specs).
    qkv_r = qkv.transpose(0, 2, 3, 1, 4).reshape(N, 3 * H, S, D)
    out = pl.pallas_call(
        _squeeze_kernel(functools.partial(_fwd_kernel, scale=scale)),
        grid=(N, H),
        in_specs=_qkv_specs(S, H, D),
        out_specs=pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, S, D), qkv.dtype),
        interpret=INTERPRET,
    )(qkv_r, qkv_r, qkv_r)
    return out.transpose(0, 2, 1, 3)                      # (N, S, H, D)


def _fused_attention_vjp_fwd(qkv, scale):
    return _fused_attention_fwd_impl(qkv, scale), qkv


def _fused_attention_vjp_bwd(scale, qkv, g):
    if not _use_pallas(qkv):
        _, vjp = jax.vjp(lambda a: _attn_reference(a, scale), qkv)
        return (vjp(g)[0],)
    N, S, _, H, D = qkv.shape
    qkv_r = qkv.transpose(0, 2, 3, 1, 4).reshape(N, 3 * H, S, D)
    g_r = g.reshape(N, S, H, D).transpose(0, 2, 1, 3)     # (N, H, S, D)
    head_spec = pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0))
    dq, dk, dv = pl.pallas_call(
        _squeeze_kernel(functools.partial(_bwd_kernel, scale=scale)),
        grid=(N, H),
        in_specs=_qkv_specs(S, H, D) + [head_spec],
        out_specs=[head_spec, head_spec, head_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, S, D), qkv.dtype),
            jax.ShapeDtypeStruct((N, H, S, D), qkv.dtype),
            jax.ShapeDtypeStruct((N, H, S, D), qkv.dtype),
        ],
        interpret=INTERPRET,
    )(qkv_r, qkv_r, qkv_r, g_r)
    # (N, H, S, D) x3 -> (N, S, 3, H, D)
    dqkv = jnp.stack([dq, dk, dv], axis=1).transpose(0, 3, 1, 2, 4)
    return (dqkv,)


fused_attention.defvjp(_fused_attention_vjp_fwd, _fused_attention_vjp_bwd)
