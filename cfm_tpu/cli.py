"""CLI entry points: ``python -m cfm_tpu.cli train preset [overrides...]``.

The framework's L5 entry layer — counterpart of the reference's Hydra
``src/train.py``/``src/eval.py`` (/root/reference/runner/src/train.py:126-137,
eval.py:48-111) and the absl scripts (examples/images/cifar10/*.py). Presets
replace the experiment yaml overlays; dotted overrides replace Hydra's
command-line syntax.

Examples:
  python -m cfm_tpu.cli train 2d_otcfm trainer.total_steps=2000
  python -m cfm_tpu.cli train cifar10_otcfm optim.lr=1e-4
  python -m cfm_tpu.cli eval 2d_otcfm            # restore latest ckpt, eval
  python -m cfm_tpu.cli presets                  # list presets
"""

from __future__ import annotations

import sys

from .config import available_presets, load_config
from .trainer import Trainer


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd = argv.pop(0)
    if cmd == "presets":
        for p in available_presets():
            print(p)
        return 0
    if cmd not in ("train", "eval"):
        print(f"unknown command {cmd!r}; use train | eval | presets")
        return 2
    if not argv:
        print("missing preset name; see `presets`")
        return 2
    preset = argv.pop(0)
    cfg = load_config(preset, argv)
    print(cfg.tree_str())
    trainer = Trainer(cfg)
    if cmd == "train":
        trainer.fit()
        print("final eval:", trainer.evaluate())
    else:
        if trainer.ckpt.latest_step() is None:
            print("no checkpoint to evaluate; run train first")
            return 1
        print("eval:", trainer.evaluate())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
