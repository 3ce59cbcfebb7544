"""Data-parallel scaling table on a spoofed CPU mesh (functional validation).

Runs the replicated-coupling OT-CFM train step (the flagship dp mode,
cfm_tpu.train.make_data_parallel_train_step) at 1/2/4/8 virtual devices with
the per-device batch held constant, and records steps/s. CAVEAT: virtual CPU
devices share the same host cores, so this measures SPMD program overhead and
correctness of the sharding, NOT real scaling — the real 1->8 chip table
needs a v5e-8 slice (ROADMAP). What this does establish: the compiled dp
program contains no GSPMD gather-to-one-device serialization (the round-1
"involuntary full rematerialization" is gone — warnings are captured and the
run fails if any appear).

Usage: python tools/scaling_table.py [--devices 8] [--per-device-batch 16]
           [--fixed-work --global-batch 128] [--reps 3]

--fixed-work holds the GLOBAL batch constant while devices vary (strong
scaling) instead of the default constant per-device batch (weak scaling);
--reps reports the median of R repetitions — both added for VERDICT r2
weak-6 (the single-rep weak-scaling table was noisy, non-monotone
evidence). Writes results to stdout as a JSON list.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = """
import io, json, sys, time, contextlib
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
from cfm_tpu.models import MLP
from cfm_tpu.train import (
    init_train_state, make_optimizer, make_data_parallel_train_step,
)

n_dev = int(sys.argv[1])
batch = int(sys.argv[2])  # GLOBAL batch (parent already resolved the mode)
n_reps = int(sys.argv[3])
devices = jax.devices()[:n_dev]
assert len(devices) == n_dev
mesh = jax.sharding.Mesh(np.array(devices), ("data",))

model = MLP(dim=2, w=64)
key = jax.random.PRNGKey(0)
params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
opt = make_optimizer(lr=1e-3, warmup_steps=0)
state = init_train_state(params, opt)
matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.0)
step = make_data_parallel_train_step(matcher, model.apply, opt, mesh)

k0, k1, ks = jax.random.split(jax.random.PRNGKey(1), 3)
x0 = jax.random.normal(k0, (batch, 2))
x1 = jax.random.normal(k1, (batch, 2))

stderr_buf = io.StringIO()
with contextlib.redirect_stderr(stderr_buf):
    state, m = step(state, ks, x0, x1)  # compile
    float(m["loss"])
warnings = stderr_buf.getvalue()
assert "Involuntary full rematerialization" not in warnings, warnings

n_steps = 50
rates = []
for _ in range(n_reps):
    t0 = time.perf_counter()
    for _ in range(n_steps):
        ks, k = jax.random.split(ks)
        state, m = step(state, k, x0, x1)
    loss = float(m["loss"])
    dt = time.perf_counter() - t0
    assert loss == loss
    rates.append(n_steps / dt)
rates.sort()
print(json.dumps({"devices": n_dev, "global_batch": batch,
                  "steps_per_s": round(rates[len(rates) // 2], 2),
                  "reps": n_reps}))
"""


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--per-device-batch", type=int, default=16)
    p.add_argument("--fixed-work", action="store_true",
                   help="hold the GLOBAL batch constant (strong scaling)")
    p.add_argument("--global-batch", type=int, default=128)
    p.add_argument("--reps", type=int, default=3,
                   help="median over this many 50-step repetitions")
    args = p.parse_args()

    results = []
    n = 1
    while n <= args.devices:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        gbatch = args.global_batch if args.fixed_work else args.per_device_batch * n
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(n), str(gbatch), str(args.reps)],
            capture_output=True, text=True, env=env, timeout=560,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"scaling run at {n} devices failed")
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
        n *= 2
    print(json.dumps(results))


if __name__ == "__main__":
    main()
