"""A/B the Pallas attention softmax exp variants on real TPU (VERDICT r3 #7a).

Times fused_attention_t forward+backward at the CIFAR recipe shape
(N=128, H=4, S=256, D=64, bf16) for each SOFTMAX_EXP variant, plus the
end-to-end train-mode step via bench.py's harness if --full is given.
Prints ms per fwd+bwd call (median of reps) and the max |Δ| of outputs and
grads vs the f32-exp baseline, so the numerics gate is part of the verdict.

Usage:  python tools/attn_softmax_bench.py [--reps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from cfm_tpu.ops import pallas_attention as pa
    from cfm_tpu.profiling import hard_sync

    N, H, S, D = args.batch, 4, 256, 64
    key = jax.random.PRNGKey(0)
    qkv_t = jax.random.normal(key, (N, 3, H, S, D), jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)

    def make_fn(k_iters):
        # Re-close over the module flag: the kernel reads SOFTMAX_EXP at
        # trace time, so each variant needs a fresh jit. K dependent
        # fwd+bwd iterations amortize the axon dispatch RTT (~25 ms/call
        # single-shot — larger than the kernel itself); per-iteration time
        # is differenced between two K values below.
        @jax.jit
        def chain(q):
            def body(i, acc):
                out, vjp = jax.vjp(lambda a: pa.fused_attention_t(a, scale), acc)
                (dq,) = vjp(jnp.ones_like(out))
                return acc + 0.001 * dq
            return jax.lax.fori_loop(0, k_iters, body, q)

        return chain

    def time_chain(fn):
        out = fn(qkv_t)
        hard_sync(out)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(qkv_t)
            hard_sync(out)
            times.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(times))

    K_LO, K_HI = 8, 40

    def make_one(q_):
        @jax.jit
        def one(q):
            out, vjp = jax.vjp(lambda a: pa.fused_attention_t(a, scale), q)
            (dq,) = vjp(jnp.ones_like(out))
            return out, dq
        return one

    results = {}
    for variant in ("exp", "exp2", "bf16"):
        pa.SOFTMAX_EXP = variant
        t_lo = time_chain(make_fn(K_LO))
        t_hi = time_chain(make_fn(K_HI))
        per_iter = (t_hi - t_lo) / (K_HI - K_LO)
        out, dq = make_one(qkv_t)(qkv_t)
        results[variant] = (per_iter,
                            np.asarray(out, np.float32),
                            np.asarray(dq, np.float32))
        print(f"{variant:5s}: {per_iter:7.3f} ms/fwd+bwd "
              f"(chain K={K_LO}: {t_lo:.2f} ms, K={K_HI}: {t_hi:.2f} ms)")

    pa.SOFTMAX_EXP = "exp"
    base_out, base_dq = results["exp"][1], results["exp"][2]
    for variant in ("exp2", "bf16"):
        _, out, dq = results[variant]
        print(f"{variant:5s}: max|dout| {np.abs(out - base_out).max():.3e}  "
              f"max|ddq| {np.abs(dq - base_dq).max():.3e}")


if __name__ == "__main__":
    main()
