"""Measure the ceiling of GN->qkv->attention->out->residual Pallas fusion.

VERDICT r3 item 7b: could folding the AttentionBlock's GroupNorm + both
projections + residual into the Pallas attention kernel (one kernel per
batch item, everything VMEM-resident) beat the current composition
(XLA GN fusion + XLA einsum projections + the Pallas attention core)?

This script implements the fully-fused FORWARD kernel and times it against
the production composition at the CIFAR recipe shape (bs128, 16x16x256,
H=4 D=64). Forward-only on purpose: if the fused forward shows no
meaningful win, writing the (large) custom VJP is settled as a negative —
the trace already bounds the attention-adjacent GN/projection fusion
traffic below ~1 ms/step of the 47 ms step.

Group stats use matmul-based group reduction (channel->group selector
matrices) so the kernel never reshapes the (S, C) token matrix — MXU does
the tiny reductions, Mosaic keeps native tiles.

Usage: python tools/fused_attn_block_bench.py [--reps 30]
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, C, H, D = 256, 256, 4, 64  # 16x16 tokens, recipe channels/heads
G = 32                        # GN groups
CG = C // G
EPS = 1e-5
SCALE = 1.0 / math.sqrt(D)


def _fused_block_kernel(x_ref, gscale_ref, gbias_ref, wq_ref, bq_ref,
                        wo_ref, bo_ref, gsel_ref, gbk_ref, o_ref):
    xs = x_ref[0].astype(jnp.float32)                      # (S, C)
    gsel, gbk = gsel_ref[:], gbk_ref[:]
    # Two-pass GN, group reduction by matmul: gsel (C, G) averages channels
    # into groups, gbk (G, C) broadcasts back.
    s1 = jnp.mean(xs, axis=0, keepdims=True)               # (1, C)
    mean_c = jax.lax.dot_general(
        jax.lax.dot_general(s1, gsel, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
        gbk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    centered = xs - mean_c
    s2 = jnp.mean(jnp.square(centered), axis=0, keepdims=True)
    gvar = jax.lax.dot_general(s2, gsel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rstd_c = jax.lax.dot_general(jax.lax.rsqrt(gvar + EPS), gbk,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    tokens = centered * rstd_c * gscale_ref[:] + gbias_ref[:]     # (S, C)

    qkv = jax.lax.dot_general(
        tokens.astype(jnp.bfloat16), wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq_ref[:]                                          # (S, 3HD) f32

    outs = []
    for h in range(H):
        q = qkv[:, (0 * H + h) * D:(0 * H + h + 1) * D]
        k = qkv[:, (1 * H + h) * D:(1 * H + h + 1) * D]
        v = qkv[:, (2 * H + h) * D:(2 * H + h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * SCALE
        m = jnp.max(logits, axis=1, keepdims=True)
        w = jnp.exp(logits - m)
        w = (w / jnp.sum(w, axis=1, keepdims=True)).astype(jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            w, v.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    attn = jnp.concatenate(outs, axis=1)                   # (S, HD) f32
    res = jax.lax.dot_general(
        attn.astype(jnp.bfloat16), wo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[:]
    o_ref[0] = (xs + res).astype(o_ref.dtype)


def fused_block(x, gscale, gbias, wq, bq, wo, bo):
    N = x.shape[0]
    gsel = jnp.asarray(np.kron(np.eye(G), np.full((CG, 1), 1.0 / CG)),
                       jnp.float32)                        # (C, G)
    gbk = jnp.asarray(np.kron(np.eye(G), np.ones((1, CG))), jnp.float32)  # (G, C)
    return pl.pallas_call(
        _fused_block_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((C, 3 * H * D), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * H * D), lambda b: (0, 0)),
            pl.BlockSpec((H * D, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((C, G), lambda b: (0, 0)),
            pl.BlockSpec((G, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, gscale, gbias, wq, bq, wo, bo, gsel, gbk)


def composition(x, gscale, gbias, wq, bq, wo, bo):
    """The production path: XLA GN + einsum projections + Pallas attention."""
    from cfm_tpu.ops.pallas_attention import fused_attention_t
    from cfm_tpu.ops.pallas_groupnorm import _gn_silu_reference

    N = x.shape[0]
    img = x.reshape(N, 16, 16, C)
    tokens = _gn_silu_reference(img, gscale[0], gbias[0], G, EPS, False)
    tokens = tokens.reshape(N, S, C)
    qkv_t = jnp.einsum(
        "nsc,ckhd->nkhsd", tokens.astype(jnp.bfloat16),
        wq.reshape(C, 3, H, D).astype(jnp.bfloat16),
    ) + bq.reshape(3, H, D).astype(jnp.bfloat16)[None, :, :, None, :]
    out_t = fused_attention_t(qkv_t, SCALE)                # (N, H, S, D)
    out = jnp.einsum(
        "nhsd,hdc->nsc", out_t, wo.reshape(H, D, C).astype(jnp.bfloat16)
    ) + bo[0].astype(jnp.bfloat16)
    return x + out.astype(x.dtype)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from cfm_tpu.profiling import hard_sync

    N = args.batch
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (N, S, C), jnp.bfloat16)
    gscale = jax.random.normal(ks[1], (1, C), jnp.float32) * 0.1 + 1.0
    gbias = jax.random.normal(ks[2], (1, C), jnp.float32) * 0.1
    wq = jax.random.normal(ks[3], (C, 3 * H * D), jnp.bfloat16) * 0.05
    bq = jax.random.normal(ks[4], (1, 3 * H * D), jnp.float32) * 0.05
    wo = jax.random.normal(ks[5], (H * D, C), jnp.bfloat16) * 0.05
    bo = jax.random.normal(ks[6], (1, C), jnp.float32) * 0.05

    def chain(fn, k_iters):
        @jax.jit
        def run(x0):
            def body(i, acc):
                return fn(acc, gscale, gbias, wq, bq, wo, bo)
            return jax.lax.fori_loop(0, k_iters, body, x0)
        return run

    def timeit(fn):
        lo, hi = 8, 40
        out = None
        ts = {}
        for k in (lo, hi):
            run = chain(fn, k)
            out = run(x)
            hard_sync(out)
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = run(x)
                hard_sync(out)
                times.append((time.perf_counter() - t0) * 1e3)
            ts[k] = float(np.median(times))
        return (ts[hi] - ts[lo]) / (hi - lo), ts

    # Numerics first.
    a = np.asarray(jax.jit(fused_block)(x, gscale, gbias, wq, bq, wo, bo),
                   np.float32)
    b = np.asarray(jax.jit(composition)(x, gscale, gbias, wq, bq, wo, bo),
                   np.float32)
    print(f"max|fused - composition| = {np.abs(a - b).max():.3e} "
          f"(bf16 tokens; rel {np.abs(a - b).max() / max(np.abs(b).max(), 1e-9):.3e})")

    per_f, ts_f = timeit(fused_block)
    print(f"fused block : {per_f:7.3f} ms/fwd  (chains {ts_f})")
    per_c, ts_c = timeit(composition)
    print(f"composition : {per_c:7.3f} ms/fwd  (chains {ts_c})")
    print(f"delta: {per_c - per_f:+.3f} ms/block-fwd x 5 blocks = "
          f"{5 * (per_c - per_f):+.3f} ms/step fwd-side bound")


if __name__ == "__main__":
    main()
