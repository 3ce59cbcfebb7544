"""CIFAR-10 flow-matching training — the reference's headline recipe, TPU-native.

Counterpart of /root/reference/examples/images/cifar10/train_cifar10.py:54-170
(and the DDP variant train_cifar10_ddp.py — subsumed: data parallelism here is
a sharding flag, not a separate script). Recipe: UNet 128ch (1,2,2,2), heads
4/64, attention@16, dropout 0.1; Adam 2e-4, linear warmup 5k, grad-clip 1.0;
EMA 0.9999; batch 128; 400k steps; checkpoint every 20k.

Usage:
  python examples/train_cifar10.py --model otcfm                 # full run
  python examples/train_cifar10.py --model icfm --total_steps 1000
  python examples/train_cifar10.py --model otcfm --synthetic     # no dataset

Model choices mirror the reference flag (train_cifar10.py:31): otcfm | icfm |
fm | si (stochastic interpolant = vpcfm).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo-root import of cfm_tpu

from cfm_tpu.config import load_config
from cfm_tpu.trainer import Trainer

MODEL_TO_MATCHER = {"otcfm": "otcfm", "icfm": "icfm", "fm": "fm", "si": "vpcfm"}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="otcfm", choices=sorted(MODEL_TO_MATCHER))
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--total_steps", type=int, default=400001)
    p.add_argument("--warmup", type=int, default=5000)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--save_step", type=int, default=20000)
    p.add_argument("--data_dir", default="data")
    p.add_argument("--output_dir", default="results")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic images when CIFAR-10 is not on disk")
    p.add_argument("--no_bf16", action="store_true")
    p.add_argument("--override", action="append", default=[],
                   help="extra config key=value overrides (repeatable)")
    args = p.parse_args()

    matcher = MODEL_TO_MATCHER[args.model]
    cfg = load_config(f"cifar10_{matcher}", [
        f"optim.lr={args.lr}",
        f"optim.warmup_steps={args.warmup}",
        f"optim.ema_decay={args.ema_decay}",
        f"optim.grad_clip={args.grad_clip}",
        f"data.batch_size={args.batch_size}",
        f"data.data_dir={args.data_dir}",
        f"data.synthetic_fallback={args.synthetic}",
        f"trainer.total_steps={args.total_steps}",
        f"trainer.ckpt_interval={args.save_step}",
        f"trainer.ckpt_dir={args.output_dir}/checkpoints",
        f"trainer.seed={args.seed}",
        f"model.bf16={not args.no_bf16}",
    ] + list(args.override))
    cfg.name = f"cifar10_{args.model}"
    trainer = Trainer(cfg, log_dir=f"{args.output_dir}/logs")
    trainer.fit()


if __name__ == "__main__":
    main()
