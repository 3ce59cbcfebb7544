"""MNIST flow matching: unconditional and class-conditional, ODE + SDE sampling.

CLI counterpart of the reference notebooks
/root/reference/examples/images/mnist_example.ipynb (OT-CFM / SB-CFM, 32ch
UNet) and conditional_mnist.ipynb (guided coupling with labels fed to the
UNet class embedding).

Usage:
  python examples/train_mnist.py --matcher otcfm --steps 2000
  python examples/train_mnist.py --matcher otcfm --conditional
  python examples/train_mnist.py --matcher sbcfm --sde     # SF2M-style
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cfm_tpu.config import load_config
from cfm_tpu.eval.plotting import image_grid
from cfm_tpu.trainer import Trainer


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--matcher", default="otcfm",
                   choices=["icfm", "otcfm", "fm", "sbcfm", "vpcfm"])
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--conditional", action="store_true")
    p.add_argument("--sde", action="store_true", help="train a score head; sample via SDE")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--output_dir", default="results")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    preset = "mnist_otcfm_cond" if args.conditional else f"mnist_{args.matcher}"
    overrides = [
        f"trainer.total_steps={args.steps}",
        f"data.batch_size={args.batch_size}",
        f"data.data_dir={args.data_dir}",
        f"data.synthetic_fallback={args.synthetic}",
        f"trainer.ckpt_dir={args.output_dir}/checkpoints",
    ]
    if not args.conditional:
        overrides.append(f"matcher.kind={args.matcher}")
    if args.sde:
        overrides += ["matcher.score_head=True", "matcher.sigma=1.0",
                      "matcher.kind=sbcfm", "eval.sde=True"]
    cfg = load_config(preset, overrides)
    trainer = Trainer(cfg, log_dir=f"{args.output_dir}/logs")
    trainer.fit()

    # Sample grids (conditional: one row per class, reference
    # conditional_mnist.ipynb's generation cell).
    key = jax.random.PRNGKey(1)
    if args.conditional:
        y = jnp.repeat(jnp.arange(10), 8)
        imgs = trainer.generate(key, 80, method="euler", n_steps=100, y=y)
    elif args.sde:
        imgs = trainer.generate_sde(key, 64, n_steps=100).final
    else:
        imgs = trainer.generate(key, 64, method="euler", n_steps=100)
    path = image_grid(imgs, nrow=8, save_path=f"{args.output_dir}/mnist_samples.png")
    print("saved samples to", path)


if __name__ == "__main__":
    main()
