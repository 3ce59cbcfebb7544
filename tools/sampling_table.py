"""Image-generation throughput table (the FID 50k-protocol hot loop).

Measures images/s on the real TPU for the reference's two FID integration
modes (/root/reference/examples/images/cifar10/compute_fid.py:24,67-91):

- euler 100 steps  (``--integration_method euler --integration_steps 100``)
- dopri5 tol 1e-5  (the headline protocol; NFE depends on the learned field,
                    so pass ``--ckpt-dir`` with a trained checkpoint for a
                    representative number — random init gives a near-linear
                    field and an unrealistically low NFE)

plus rk4-100 as the fixed-step upper-accuracy point. Each mode runs the
full recipe UNet (128ch, bs ``--batch``) through ``Trainer.generate`` —
the exact program ``examples/compute_fid.py`` uses — and reports the
solver-counted NFE next to the rate. 50k-image wall-clock estimates follow.

Run: python tools/sampling_table.py [--ckpt-dir results/soak_r5/ckpts]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--ckpt-dir", default="")
    args = p.parse_args()

    from cfm_tpu.compile_cache import enable as enable_cache

    enable_cache()
    from cfm_tpu.config import load_config
    from cfm_tpu.trainer import Trainer

    overrides = ["trainer.data_parallel=False"]
    if args.ckpt_dir:
        overrides.append(f"trainer.ckpt_dir={args.ckpt_dir}")
    cfg = load_config("cifar10_otcfm", overrides)
    # Trainer auto-restores the latest checkpoint under ckpt_dir on init.
    trainer = Trainer(cfg, log_dir="/tmp/sampling_table_logs")
    step = int(trainer.state.step)
    print(f"params: {'checkpoint step ' + str(step) if step else 'random init'}")

    from cfm_tpu.profiling import hard_sync

    modes = [("euler", 100), ("rk4", 100), ("dopri5", 100)]
    rows = []
    for method, n_steps in modes:
        key = jax.random.PRNGKey(0)
        sol = trainer.generate(key, args.batch, method=method, n_steps=n_steps,
                               return_solution=True)
        hard_sync(sol.final)  # axon-safe fence
        t0 = time.perf_counter()
        for r in range(args.reps):
            sol = trainer.generate(jax.random.PRNGKey(r + 1), args.batch,
                                   method=method, n_steps=n_steps,
                                   return_solution=True)
        hard_sync(sol.final)
        dt = (time.perf_counter() - t0) / args.reps
        nfe = float(sol.nfe)
        rate = args.batch / dt
        rows.append((method, nfe, rate, 50000 / rate / 60.0))

    print(f"\n| integrator | NFE | imgs/s (bs {args.batch}) | 50k-image wall clock |")
    print("|---|---|---|---|")
    for method, nfe, rate, mins in rows:
        print(f"| {method} | {nfe:.0f} | {rate:.1f} | {mins:.1f} min |")


if __name__ == "__main__":
    main()
