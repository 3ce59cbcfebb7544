"""Exact-OT coupling scale table (VERDICT r2 task 7).

Measures ms/batch of the minibatch exact-OT assignment across
bs in {128, 512, 1024, 2048, 4096} for three solvers on the real TPU:

- pallas      : auto-routed Pallas auction (in-VMEM dense <=512, row-tiled
                compact-state above — HBM-streamed at n>=2048)
- xla_auction : the while_loop auction in plain XLA ops
- host_jv     : native C++ Jonker-Volgenant (ops/native/lap.cc) on the host,
                timed including the device->host cost-matrix transfer — the
                reference's POT-on-CPU role (optimal_transport.py:87)

plus an IN-TRAIN-STEP datapoint: the full 2-D OT-CFM train step (coupling +
path sample + MLP fwd/bwd + Adam + EMA, one jitted program) at bs 2048 and
4096, with the coupling's exactness pinned against host JV.

Prints a markdown table for the README. Run: python tools/coupling_table.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cfm_tpu.compile_cache import enable as enable_cache

SIZES = (128, 512, 1024, 2048, 4096)
REPS = {128: 20, 512: 10, 1024: 5, 2048: 3, 4096: 2}


def _clouds(n, d=2, seed=0):
    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k0, (n, d)),
            jax.random.normal(k1, (n, d)) + 1.5)


def _time(fn, reps):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    # Hard sync: fetch a scalar (block_until_ready unreliable over axon).
    np.asarray(out)[:1]
    return (time.perf_counter() - t0) / reps * 1e3


def main() -> None:
    enable_cache()
    from cfm_tpu.ops.assignment import (
        assignment_cost, auction_assignment, solve_assignment,
    )
    from cfm_tpu.ops.cost import sq_euclidean_cost
    from cfm_tpu.ops.native import lap_solve

    rows = []
    for n in SIZES:
        x0, x1 = _clouds(n)
        M = jax.jit(sq_euclidean_cost)(x0, x1)
        np.asarray(M[:1, :1])
        reps = REPS[n]

        pallas_fn = jax.jit(lambda M: solve_assignment(M, "auto"))
        t_pallas = _time(lambda: pallas_fn(M), reps)
        perm = np.asarray(pallas_fn(M))

        if n <= 1024:
            auc_fn = jax.jit(lambda M: auction_assignment(M))
            t_auction = _time(lambda: auc_fn(M), max(1, reps // 2))
        else:
            t_auction = float("nan")  # >10 s/solve: not worth the TPU time

        M_host = np.asarray(M)

        def host_jv():
            Mh = np.asarray(M)  # include transfer, like the torch->POT path
            p, _ = lap_solve(Mh)
            return p

        t_jv = _time(host_jv, max(1, reps // 2))
        p_jv, c_jv = lap_solve(M_host)

        assert sorted(perm.tolist()) == list(range(n)), n
        c_pallas = float(M_host[np.arange(n), perm].sum())
        rel = abs(c_pallas - c_jv) / c_jv
        rows.append((n, t_pallas, t_auction, t_jv, rel))
        print(f"# n={n}: pallas {t_pallas:.1f} ms, xla_auction {t_auction:.1f} ms, "
              f"host JV {t_jv:.1f} ms, cost gap {rel:.2e}", file=sys.stderr,
              flush=True)

    print("| batch | pallas auction (auto) | XLA auction | host JV (C++) | cost vs JV |")
    print("|---|---|---|---|---|")
    for n, tp, ta, tj, rel in rows:
        ta_s = f"{ta:.1f} ms" if ta == ta else "-"
        print(f"| {n} | {tp:.1f} ms | {ta_s} | {tj:.1f} ms | {rel:.1e} |")

    # In-train-step datapoint: full OT-CFM 2-D step at large batch.
    from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
    from cfm_tpu.models import MLP
    from cfm_tpu.train import init_train_state, make_optimizer, make_train_step

    print("\n| in-step batch | full 2-D OT-CFM step | steps/s |")
    print("|---|---|---|")
    for n in (2048, 4096):
        model = MLP(dim=2, w=64)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
        opt = make_optimizer(lr=1e-3, warmup_steps=0)
        state = init_train_state(params, opt)
        matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.0)
        step = jax.jit(make_train_step(matcher, model.apply, opt, ema_decay=0.999))
        x0, x1 = _clouds(n, seed=1)
        k = jax.random.PRNGKey(2)
        state, m = step(state, k, x0, x1)
        float(m["loss"])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            k, ks = jax.random.split(k)
            state, m = step(state, ks, x0, x1)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / reps
        print(f"| {n} | {dt*1e3:.1f} ms | {1/dt:.2f} |", flush=True)


if __name__ == "__main__":
    main()
