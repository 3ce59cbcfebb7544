"""Profile the CIFAR-10 OT-CFM train step on TPU and print a per-op table.

Captures a jax profiler trace of a few steady-state steps, parses the
xplane.pb directly (tensorflow.tsl xplane proto — the tensorboard profile
plugin is broken in this image), and aggregates device-plane event
durations by HLO op name/category. This is the measurement behind the
kernel/fusion decisions recorded in cfm_tpu/ops/pallas_groupnorm.py and
pallas_attention.py.

Usage:
  python tools/profile_step.py [--steps 3] [--batch 128] [--fwd-only]
  python tools/profile_step.py --top 40
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import tempfile
from collections import defaultdict


def categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n and "convert" not in n:
        return "convolution"
    if n.startswith(("dot", "matmul")) or ".dot" in n:
        return "matmul"
    if "attention" in n or "pallas" in n or "custom-call" in n:
        return "custom/pallas"
    if "convert" in n and ("reduce" in n or "fusion" in n):
        return "convert_reduce_fusion"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion(elementwise)"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "host-io"
    return "other"


def parse_xplane(path: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    per_op = defaultdict(float)
    async_ms = 0.0
    for plane in space.planes:
        # Device planes are named like "/device:TPU:0" (or contain "TPU").
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        names = {mid: m.name for mid, m in plane.event_metadata.items()}
        for line in plane.lines:
            # ONLY the serialized "XLA Ops" line: events there partition the
            # device timeline. "Async XLA Ops" (DMA copy-start/slice-start
            # spans) OVERLAP compute — summing them quadruple-counts the
            # step (measured: 583 ms async vs 143 ms real for 3 steps).
            if line.name == "Async XLA Ops":
                async_ms += sum(ev.duration_ps for ev in line.events) / 1e9
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = names.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps / 1e9  # ps -> ms

    by_cat = defaultdict(float)
    for name, ms in per_op.items():
        by_cat[categorize(name)] += ms
    by_cat["[async DMA, overlapped — not in total]"] = 0.0
    per_op[f"[async DMA total (overlapped): {async_ms:.2f} ms]"] = 0.0
    return per_op, by_cat


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--train-mode", action="store_true",
                    help="dropout active (the recipe's real config)")
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; parse this xplane.pb (or logdir)")
    args = ap.parse_args()

    if args.parse_only:
        target = args.parse_only
    else:
        import jax
        import jax.numpy as jnp

        from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
        from cfm_tpu.compile_cache import enable as enable_cache
        from cfm_tpu.models import UNetModelWrapper
        from cfm_tpu.profiling import hard_sync
        from cfm_tpu.train import init_train_state, make_optimizer, make_train_step

        enable_cache()
        model = UNetModelWrapper(
            dim=(32, 32, 3), num_channels=128, channel_mult=(1, 2, 2, 2),
            num_res_blocks=2, num_heads=4, num_head_channels=64,
            attention_resolutions="16", dropout=0.1, dtype=jnp.bfloat16,
        )
        key = jax.random.PRNGKey(0)
        params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 32, 32, 3)))

        if args.fwd_only:
            t = jnp.full((args.batch,), 0.5)
            x = jax.random.normal(key, (args.batch, 32, 32, 3))
            fn = jax.jit(lambda p, t, x: model.apply(p, t, x))
            run = lambda: fn(params, t, x)
        else:
            matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.0)
            opt = make_optimizer(lr=2e-4, warmup_steps=5000, grad_clip=1.0)
            state = init_train_state(params, opt)
            step = jax.jit(make_train_step(matcher, model.apply, opt,
                                           ema_decay=0.9999,
                                           train_mode=args.train_mode))
            k0, k1, ks = jax.random.split(key, 3)
            x0 = jax.random.normal(k0, (args.batch, 32, 32, 3))
            x1 = jax.random.normal(k1, (args.batch, 32, 32, 3))

            def run():
                nonlocal state
                state, m = step(state, ks, x0, x1)
                return m

        out = run()  # compile
        hard_sync(out)
        logdir = args.logdir or tempfile.mkdtemp(prefix="xplane_")
        jax.profiler.start_trace(logdir)
        for _ in range(args.steps):
            out = run()
        hard_sync(out)
        jax.profiler.stop_trace()
        target = logdir
        print(f"trace written to {logdir}")

    if os.path.isdir(target):
        pbs = glob.glob(os.path.join(target, "**", "*.xplane.pb"), recursive=True)
        assert pbs, f"no xplane.pb under {target}"
        target = max(pbs, key=os.path.getmtime)
    per_op, by_cat = parse_xplane(target, args.top)
    total = sum(by_cat.values())
    n = args.steps if not args.parse_only else 1
    print(f"\n== by category (total {total:.2f} ms over {n} steps, "
          f"{total / max(n,1):.2f} ms/step) ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:28s} {ms:8.2f} ms  ({100*ms/total:4.1f}%)")
    print(f"\n== top {args.top} ops ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {ms:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
