"""Fully-fused UNet AttentionBlock Pallas kernel: GN + qkv proj + MHA +
out proj + residual in ONE kernel per batch item.

Round-4 measured motivation (tools/fused_attn_block_bench.py, v5e, recipe
shape bs128 / 16x16x256 / H=4 D=64): the fused forward runs 0.316 ms vs
0.417 ms for the production composition (XLA GN fusion + einsum projections
+ the Pallas attention core) — the composition's intermediate (S, C) token
tensor and (N, 3, H, S, D) qkv tensor round-trip HBM between ops, while
here everything after the x read stays VMEM-resident.

Design notes:
- **Group statistics by matmul.** The kernel never reshapes the (S, C)
  token matrix into (S, G, cg): channel->group averaging is a (C, G)
  selector matmul and group->channel broadcast a (G, C) one — tiny MXU work
  that keeps Mosaic on native tiles.
- **Recompute backward.** The VJP saves only the primal inputs: the
  backward kernel re-runs GN + projections + softmax per batch item and
  accumulates weight gradients ACROSS grid cells into f32 output blocks
  with constant index maps (TPU grid cells run sequentially, so
  init-at-cell-0 + accumulate is race-free — the standard flash-attention
  wgrad pattern).
- **Dtype contract matches the composition** (models/unet.py AttentionBlock:
  reference unet.py:237-366): GN statistics and affine in f32, tokens
  rounded to the model dtype, qkv matmul f32-accumulated then rounded,
  softmax in f32, weights rounded to model dtype before the value matmul,
  out projection f32-accumulated. The backward differentiates exactly the
  function the forward computes (rounding points mirrored).

Routing: :func:`use_fused_block` gates on TPU backend, tile alignment and
a VMEM budget; off-gate callers keep the composition (which remains the
numerics oracle in tests/test_models.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5

# Test hook, mirroring ops/pallas_attention.INTERPRET.
INTERPRET = False
# Kill switch for A/B measurement at the model level.
ENABLED = True


def _group_mats(C: int, G: int):
    cg = C // G
    gsel = np.kron(np.eye(G), np.full((cg, 1), 1.0 / cg)).astype(np.float32)
    gbk = np.kron(np.eye(G), np.ones((1, cg))).astype(np.float32)
    return jnp.asarray(gsel), jnp.asarray(gbk)  # (C, G), (G, C)


def _dotf(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _gn_forward(xs, gscale, gbias, gsel, gbk):
    """Two-pass GN on (S, C) f32; returns (tokens_f32, centered, rstd_c)."""
    s1 = jnp.mean(xs, axis=0, keepdims=True)                       # (1, C)
    mean_c = _dotf(_dotf(s1, gsel, ((1,), (0,))), gbk, ((1,), (0,)))
    centered = xs - mean_c
    s2 = jnp.mean(jnp.square(centered), axis=0, keepdims=True)
    gvar = _dotf(s2, gsel, ((1,), (0,)))
    rstd_c = _dotf(jax.lax.rsqrt(gvar + _EPS), gbk, ((1,), (0,)))  # (1, C)
    tokens = centered * rstd_c * gscale + gbias
    return tokens, centered, rstd_c


def _attn_heads_fwd(qkv_lp, n_heads, head_dim, scale, lp):
    """Per-head attention over qkv (S, 3HD) in the model dtype; returns the
    concatenated (S, HD) f32 context and the f32 softmax list for reuse."""
    H, D = n_heads, head_dim
    outs, wfs = [], []
    for h in range(H):
        q = qkv_lp[:, (0 * H + h) * D:(0 * H + h + 1) * D].astype(jnp.float32)
        k = qkv_lp[:, (1 * H + h) * D:(1 * H + h + 1) * D].astype(jnp.float32)
        logits = _dotf(q, k, ((1,), (1,))) * scale                 # (S, S)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        wf = e / jnp.sum(e, axis=1, keepdims=True)                 # f32
        wfs.append(wf)
        outs.append(_dotf(
            wf.astype(lp), qkv_lp[:, (2 * H + h) * D:(2 * H + h + 1) * D],
            ((1,), (0,)),
        ))
    return jnp.concatenate(outs, axis=1), wfs                      # (S, HD)


def _fwd_kernel(x_ref, gscale_ref, gbias_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                gsel_ref, gbk_ref, o_ref, *, n_heads, head_dim, scale):
    lp = x_ref.dtype
    xs = x_ref[0].astype(jnp.float32)                              # (S, C)
    tokens, _, _ = _gn_forward(xs, gscale_ref[:], gbias_ref[:],
                               gsel_ref[:], gbk_ref[:])
    tokens_lp = tokens.astype(lp)
    qkv_lp = (_dotf(tokens_lp, wq_ref[:], ((1,), (0,))).astype(lp)
              + bq_ref[:].astype(lp))                              # (S, 3HD)
    attn, _ = _attn_heads_fwd(qkv_lp, n_heads, head_dim, scale, lp)
    res = _dotf(attn.astype(lp), wo_ref[:], ((1,), (0,))) + bo_ref[:]
    o_ref[0] = (xs + res).astype(o_ref.dtype)


def _bwd_kernel(x_ref, gscale_ref, gbias_ref, wq_ref, bq_ref, wo_ref, bo_ref,
                gsel_ref, gbk_ref, dy_ref,
                dx_ref, dgscale_ref, dgbias_ref, dwq_ref, dbq_ref,
                dwo_ref, dbo_ref, *, n_heads, head_dim, scale):
    lp = x_ref.dtype
    H, D = n_heads, head_dim
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dgscale_ref[:] = jnp.zeros_like(dgscale_ref)
        dgbias_ref[:] = jnp.zeros_like(dgbias_ref)
        dwq_ref[:] = jnp.zeros_like(dwq_ref)
        dbq_ref[:] = jnp.zeros_like(dbq_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    gscale, gbias = gscale_ref[:], gbias_ref[:]
    gsel, gbk = gsel_ref[:], gbk_ref[:]
    xs = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)                             # (S, C)

    # ---- recompute forward ----
    tokens, centered, rstd_c = _gn_forward(xs, gscale, gbias, gsel, gbk)
    tokens_lp = tokens.astype(lp)
    qkv_lp = (_dotf(tokens_lp, wq_ref[:], ((1,), (0,))).astype(lp)
              + bq_ref[:].astype(lp))
    attn, wfs = _attn_heads_fwd(qkv_lp, H, D, scale, lp)
    attn_lp = attn.astype(lp)

    # ---- out projection + residual backward ----
    dres = dy                                                      # (S, C) f32
    dbo_ref[:] += jnp.sum(dres, axis=0, keepdims=True)
    dwo_ref[:] += _dotf(attn_lp, dres.astype(lp), ((0,), (0,)))
    dattn = _dotf(dres.astype(lp), wo_ref[:], ((1,), (1,)))        # (S, HD) f32

    # ---- per-head attention backward (recompute softmax rounding) ----
    dqkv_cols = [None] * (3 * H)
    for h in range(H):
        q = qkv_lp[:, (0 * H + h) * D:(0 * H + h + 1) * D].astype(jnp.float32)
        k = qkv_lp[:, (1 * H + h) * D:(1 * H + h + 1) * D].astype(jnp.float32)
        v = qkv_lp[:, (2 * H + h) * D:(2 * H + h + 1) * D].astype(jnp.float32)
        wf = wfs[h]
        w = wf.astype(lp).astype(jnp.float32)  # fwd rounded w before w @ v
        do = dattn[:, h * D:(h + 1) * D]                           # (S, D)
        dv = _dotf(w, do, ((0,), (0,)))                            # (S, D)
        dp = _dotf(do, v, ((1,), (1,)))                            # (S, S)
        dw = dp - jnp.sum(dp * w, axis=1, keepdims=True)
        ds = wf * dw * scale
        dqkv_cols[0 * H + h] = _dotf(ds, k, ((1,), (0,)))
        dqkv_cols[1 * H + h] = _dotf(ds, q, ((0,), (0,)))
        dqkv_cols[2 * H + h] = dv
    dqkv = jnp.concatenate(dqkv_cols, axis=1)                      # (S, 3HD) f32

    # ---- qkv projection backward ----
    dbq_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dwq_ref[:] += _dotf(tokens_lp, dqkv.astype(lp), ((0,), (0,)))
    dtokens = _dotf(dqkv.astype(lp), wq_ref[:], ((1,), (1,)))      # (S, C) f32

    # ---- GN backward ----
    x_hat = centered * rstd_c
    dgscale_ref[:] += jnp.sum(dtokens * x_hat, axis=0, keepdims=True)
    dgbias_ref[:] += jnp.sum(dtokens, axis=0, keepdims=True)
    dxhat = dtokens * gscale
    m1 = _dotf(_dotf(jnp.mean(dxhat, axis=0, keepdims=True), gsel,
                     ((1,), (0,))), gbk, ((1,), (0,)))
    m2 = _dotf(_dotf(jnp.mean(dxhat * x_hat, axis=0, keepdims=True), gsel,
                     ((1,), (0,))), gbk, ((1,), (0,)))
    dx_gn = rstd_c * (dxhat - m1 - x_hat * m2)
    dx_ref[0] = (dy + dx_gn).astype(dx_ref.dtype)


# Per-cell VMEM budget: x + dy + dx (S,C) + qkv/dqkv (S,3HD) f32 + ~3 (S,S)
# f32 working set + weights. Conservative bound, same spirit as
# pallas_attention._VMEM_BUDGET_BYTES.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _vmem_bytes(S: int, C: int, H: int, D: int, itemsize: int) -> int:
    return (3 * itemsize * S * C            # x, dy, dx in model dtype
            + 4 * (2 * S * 3 * H * D)       # qkv + dqkv f32
            + 4 * 3 * S * S                 # logits/softmax/dp f32
            + 4 * 4 * S * C                 # tokens/centered/dtokens/x_hat f32
            + 2 * itemsize * (C * 3 * H * D + H * D * C))  # weights + wgrads


def use_fused_block(S: int, C: int, n_heads: int, dtype) -> bool:
    """TPU backend + tile alignment + VMEM budget + group divisibility.

    S (= H*W tokens) only needs sublane alignment (8) at >= 64 — the token
    matrices' minor dim is C, so 8x8 attention maps (S=64, the reference's
    multi-resolution ``attention_resolutions="16,8"`` configs) qualify;
    C must be lane-aligned (128) and D a multiple of 64.
    """
    if C % n_heads:
        return False
    D = C // n_heads
    groups = min(32, C)
    while C % groups:
        groups -= 1
    aligned = S % 8 == 0 and S >= 64 and D % 64 == 0 and C % 128 == 0
    fits = _vmem_bytes(S, C, n_heads, D, jnp.dtype(dtype).itemsize) <= _VMEM_BUDGET_BYTES
    return ENABLED and aligned and fits and (
        INTERPRET or jax.default_backend() in ("tpu", "axon")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_attention_block(x, gscale, gbias, wq, bq, wo, bo,
                          n_heads: int, groups: int):
    """y = x + OutProj(MHA(QKVProj(GroupNorm(x)))) in one Pallas kernel.

    x: (N, S, C) model dtype; gscale/gbias: (1, C) f32 GN affine;
    wq: (C, 3*H*D) / bq: (1, 3*H*D) / wo: (H*D, C) / bo: (1, C) — the
    AttentionBlock einsum parameters flattened ([k][h][d] / [h][d] axis
    order); ``groups`` is the GN group count. Returns (N, S, C).
    """
    return _fwd_impl(x, gscale, gbias, wq, bq, wo, bo, n_heads, groups)


def _specs(C, HD3, HD, G):
    return [
        None,  # x, filled per-call
        pl.BlockSpec((1, C), lambda b: (0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
        pl.BlockSpec((C, HD3), lambda b: (0, 0)),
        pl.BlockSpec((1, HD3), lambda b: (0, 0)),
        pl.BlockSpec((HD, C), lambda b: (0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
        pl.BlockSpec((C, G), lambda b: (0, 0)),
        pl.BlockSpec((G, C), lambda b: (0, 0)),
    ]


def _fwd_impl(x, gscale, gbias, wq, bq, wo, bo, n_heads, groups):
    N, S, C = x.shape
    D = C // n_heads
    HD3, HD = 3 * n_heads * D, n_heads * D
    lp = x.dtype
    gsel, gbk = _group_mats(C, groups)
    specs = _specs(C, HD3, HD, groups)
    specs[0] = pl.BlockSpec((1, S, C), lambda b: (b, 0, 0))
    scale = 1.0 / math.sqrt(D)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=n_heads, head_dim=D, scale=scale),
        grid=(N,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, S, C), lp),
        interpret=INTERPRET,
    )(x, gscale, gbias, wq.astype(lp), bq, wo.astype(lp), bo, gsel, gbk)


def _vjp_fwd(x, gscale, gbias, wq, bq, wo, bo, n_heads, groups):
    y = _fwd_impl(x, gscale, gbias, wq, bq, wo, bo, n_heads, groups)
    return y, (x, gscale, gbias, wq, bq, wo, bo)


def _vjp_bwd(n_heads, groups, saved, dy):
    x, gscale, gbias, wq, bq, wo, bo = saved
    N, S, C = x.shape
    D = C // n_heads
    HD3, HD = 3 * n_heads * D, n_heads * D
    lp = x.dtype
    gsel, gbk = _group_mats(C, groups)
    specs = _specs(C, HD3, HD, groups)
    specs[0] = pl.BlockSpec((1, S, C), lambda b: (b, 0, 0))
    specs.append(pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)))  # dy
    scale = 1.0 / math.sqrt(D)
    out_shapes = (
        jax.ShapeDtypeStruct((N, S, C), lp),          # dx
        jax.ShapeDtypeStruct((1, C), jnp.float32),    # dgscale
        jax.ShapeDtypeStruct((1, C), jnp.float32),    # dgbias
        jax.ShapeDtypeStruct((C, HD3), jnp.float32),  # dwq
        jax.ShapeDtypeStruct((1, HD3), jnp.float32),  # dbq
        jax.ShapeDtypeStruct((HD, C), jnp.float32),   # dwo
        jax.ShapeDtypeStruct((1, C), jnp.float32),    # dbo
    )
    out_specs = (
        pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
        pl.BlockSpec((C, HD3), lambda b: (0, 0)),
        pl.BlockSpec((1, HD3), lambda b: (0, 0)),
        pl.BlockSpec((HD, C), lambda b: (0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
    )
    dx, dgscale, dgbias, dwq, dbq, dwo, dbo = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads, head_dim=D, scale=scale),
        grid=(N,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=INTERPRET,
    )(x, gscale, gbias, wq.astype(lp), bq, wo.astype(lp), bo, gsel, gbk, dy)
    return (dx, dgscale.astype(gscale.dtype), dgbias.astype(gbias.dtype),
            dwq.astype(wq.dtype), dbq.astype(bq.dtype),
            dwo.astype(wo.dtype), dbo.astype(bo.dtype))


fused_attention_block.defvjp(_vjp_fwd, _vjp_bwd)
