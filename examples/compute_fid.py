"""FID evaluation with the reference's 50k protocol.

Counterpart of /root/reference/examples/images/cifar10/compute_fid.py:30-109:
load the EMA checkpoint, generate num_gen images by integrating the learned
field from N(0, I) (dopri5 atol=rtol=1e-5, or euler with --integration_steps),
quantize to uint8 (x*127.5+128 clipped — :90), and compute FID against the
CIFAR-10 train split.

Feature network: the InceptionV3 trunk (cfm_tpu.eval.inception) when ported
weights are available via CFM_TPU_INCEPTION_WEIGHTS, else the deterministic
tracking features (NOT comparable to published FID; useful as a relative
metric between checkpoints).

Usage:
  python examples/compute_fid.py --model otcfm --integration_method dopri5
  python examples/compute_fid.py --model otcfm --integration_method euler \
      --integration_steps 100 --num_gen 10000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="otcfm", choices=["otcfm", "icfm", "fm", "si"])
    p.add_argument("--output_dir", default="results")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--integration_method", default="dopri5", choices=["dopri5", "euler", "rk4"])
    p.add_argument("--integration_steps", type=int, default=100)
    p.add_argument("--num_gen", type=int, default=50000)
    p.add_argument("--batch_size_fid", type=int, default=1024)
    p.add_argument("--tol", type=float, default=1e-5)
    p.add_argument("--step", type=int, default=None, help="checkpoint step (default latest)")
    p.add_argument(
        "--mode", default="legacy_tensorflow",
        choices=["legacy_tensorflow", "pytorch_fid"],
        help="FID preprocessing convention; legacy_tensorflow is the "
        "reference's headline protocol (compute_fid.py:95-103)",
    )
    p.add_argument("--synthetic", action="store_true",
                   help="dress-rehearsal mode: synthetic reference images "
                   "(the resulting number is plumbing-only, NOT an FID)")
    p.add_argument("--num_ref", type=int, default=0,
                   help="cap reference images (0 = full train split, the "
                   "published protocol)")
    p.add_argument("--override", action="append", default=[],
                   help="extra config key=value overrides (repeatable); "
                   "must match the overrides the checkpoint was trained with")
    args = p.parse_args()

    from cfm_tpu.config import load_config
    from cfm_tpu.data.images import load_cifar10
    from cfm_tpu.eval.fid import fid_from_features, batched_features, make_tracking_feature_fn
    from cfm_tpu.integrate import odeint, vector_field_from_model
    from cfm_tpu.trainer import Trainer

    matcher = {"otcfm": "otcfm", "icfm": "icfm", "fm": "fm", "si": "vpcfm"}[args.model]
    cfg = load_config(f"cifar10_{matcher}", [
        f"trainer.ckpt_dir={args.output_dir}/checkpoints",
        f"data.data_dir={args.data_dir}",
    ] + list(args.override))
    cfg.name = f"cifar10_{args.model}"
    trainer = Trainer(cfg, log_dir=f"{args.output_dir}/logs")
    if trainer.ckpt.latest_step() is None:
        raise SystemExit("no checkpoint found — train first")
    if args.step is not None:
        trainer.state = trainer.ckpt.restore(trainer.state, step=args.step)
    print(f"evaluating checkpoint at step {int(trainer.state.step)}")

    model = trainer.model
    params = trainer._flow_params(ema=True)  # EMA weights, like the reference
    f = vector_field_from_model(model.apply, params)

    def gen_batch(key, n):
        x0 = jax.random.normal(key, (n, 32, 32, 3))
        if args.integration_method == "dopri5":
            ts = jnp.array([0.0, 1.0])
            sol = odeint(f, x0, ts, method="dopri5", rtol=args.tol, atol=args.tol,
                         return_trajectory=False)
        else:
            ts = jnp.linspace(0.0, 1.0, args.integration_steps + 1)
            sol = odeint(f, x0, ts, method=args.integration_method,
                         return_trajectory=False)
        from cfm_tpu.eval.protocol import quantize_to_uint8

        # uint8 quantization exactly like the reference (compute_fid.py:90).
        return np.asarray(quantize_to_uint8(sol.final)), sol.nfe

    gen_images = []
    key = jax.random.PRNGKey(0)
    total_nfe = 0
    done = 0
    while done < args.num_gen:
        n = min(args.batch_size_fid, args.num_gen - done)
        key, k = jax.random.split(key)
        imgs, nfe = gen_batch(k, n)
        gen_images.append(imgs)
        total_nfe += int(nfe)
        done += n
        print(f"generated {done}/{args.num_gen} (nfe/batch {int(nfe)})", flush=True)
    gen_images = np.concatenate(gen_images)

    try:
        ref_images, _ = load_cifar10(args.data_dir, train=True,
                                     synthetic=args.synthetic)
    except FileNotFoundError:
        raise SystemExit(
            "CIFAR-10 train split not found on disk; FID reference statistics "
            "require the real dataset (or pass --synthetic for a plumbing "
            "rehearsal)"
        )
    if args.num_ref:
        ref_images = ref_images[: args.num_ref]

    try:
        from cfm_tpu.eval.fid import inception_feature_fn
        feature_fn = inception_feature_fn(mode=args.mode)
        feat_kind = f"inception[{args.mode}]"
    except FileNotFoundError:
        feature_fn = make_tracking_feature_fn((32, 32, 3))
        feat_kind = "tracking (NOT comparable to published FID)"
    print(f"feature network: {feat_kind}")

    g = batched_features(feature_fn, gen_images, 256)
    r = batched_features(feature_fn, ref_images, 256)
    fid = fid_from_features(g, r)
    print(f"FID[{feat_kind}] = {fid:.4f}  (num_gen={args.num_gen}, "
          f"method={args.integration_method}, mean NFE/batch={total_nfe // max(1, done // args.batch_size_fid)})")


if __name__ == "__main__":
    main()
