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
    """Categorize one HLO op from its full text line.

    Only the LHS (the op's own name) and the opcode token are inspected —
    the operand list mentions the *producers* of the inputs (e.g. a fusion
    consuming a Pallas output has "%custom-call" in its operand text), and
    matching on the whole line misattributed ~20 ms/step of ordinary
    fusions to custom/pallas before this fix.
    """
    lhs, _, rhs = name.partition(" = ")
    lhs = lhs.lower()
    # The result type may be a tuple with nested parens in its layouts, so
    # find the opcode by vocabulary: " <opcode>(" follows the type. Operand
    # references are "%name"-prefixed and never match " <opcode>(".
    opcode = next(
        (
            op
            for op in (
                "custom-call", "rng-bit-generator", "rng", "convolution",
                "fusion", "copy-start", "copy-done", "copy", "transpose",
                "bitcast", "reduce-scatter", "all-reduce", "all-gather",
                "all-to-all", "collective-permute", "reduce", "dot",
                "infeed", "outfeed", "send-done", "recv-done", "send",
                "recv",
            )
            if f" {op}(" in rhs
        ),
        "",
    )

    if opcode == "custom-call" or "pallas" in lhs or "attn" in lhs:
        return "custom/pallas"
    if opcode in ("rng-bit-generator", "rng"):
        return "rng"
    if opcode == "convolution" or ("conv" in lhs and "convert" not in lhs):
        return "convolution"
    # conv weight grads fuse into ops whose OUTPUT is a [kh,kw,cin,cout]
    # kernel (optionally tupled with an f32 grad-norm scalar). Small odd
    # square spatial dims identify a kernel shape (1x1 skip projections,
    # 3x3 body convs, ...); activations are [N,H,W,C] with H=W>=8.
    _KERNEL = r"(?:bf16|f32)\[(?:1,1|3,3|5,5|7,7),"
    if opcode == "fusion" and re.search(r"=\s*(?:\(f32\[\][^,]*,\s*)?" + _KERNEL, name):
        return "conv wgrad fusion"
    # Fusions CONSUMING a [kh,kw,cin,cout] kernel are conv fwd/dgrad ops
    # that XLA fused with their elementwise pre/epilogues.
    if opcode == "fusion" and re.search(r"[ (]" + _KERNEL, rhs):
        return "conv fwd/dgrad fusion"
    if opcode in ("dot", "matmul") or lhs.startswith(("dot", "matmul")) or ".dot" in lhs:
        return "matmul"
    # Collectives BEFORE the reduce branch: "%all-reduce.5" has "reduce" in
    # its lhs and used to be mis-bucketed as "reduce" (ADVICE r3).
    if opcode in ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                  "collective-permute") or lhs.startswith(
                      ("all-reduce", "all-gather", "reduce-scatter",
                       "all-to-all", "collective-permute", "%all-reduce",
                       "%all-gather", "%reduce-scatter", "%all-to-all",
                       "%collective-permute")):
        return "collective"
    if "convert" in lhs and "reduce" in lhs:
        return "convert_reduce_fusion"
    if "reduce" in lhs or opcode == "reduce":
        return "reduce"
    if opcode == "fusion" or "fusion" in lhs:
        return "fusion(elementwise)"
    if opcode in ("copy", "copy-start", "copy-done", "transpose", "bitcast") or "copy" in lhs or "transpose" in lhs:
        return "copy/transpose"
    if opcode in ("infeed", "outfeed", "send", "recv", "send-done",
                  "recv-done"):
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
    if total == 0:
        # CPU-only traces (e.g. a debug=profiler run on the spoofed mesh)
        # carry no TPU device plane; say so instead of dividing by zero.
        print(f"no TPU device ops in {target} — CPU-only trace? "
              "(the categorizer buckets TPU device planes only)")
        return
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
