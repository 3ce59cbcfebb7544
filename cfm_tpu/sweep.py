"""Sweeps: grid multirun and random hyperparameter search.

Counterpart of the reference's Hydra multirun (``python train.py -m
model=cfm,otcfm lr=1e-3,1e-4`` — runner/README, tests/test_sweeps.py:31-66)
and the optuna hparam search config (runner/configs/hparams_search/
optuna.yaml). Sweeps compose the typed config system: each spec value like
``"matcher.kind=icfm,otcfm"`` expands combinatorially; runs execute
sequentially (one TPU program at a time) and failures are caught and
recorded so the sweep continues — the reference's ``task_wrapper`` resilience
(runner/src/utils/utils.py:18-52).
"""

from __future__ import annotations

import itertools
import math
import random
import traceback
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from .config import Config, load_config


def expand_grid(overrides: Sequence[str]) -> List[List[str]]:
    """Expand comma-valued overrides into the cartesian product of runs.

    ["a.b=1,2", "c.d=x"] -> [["a.b=1","c.d=x"], ["a.b=2","c.d=x"]]
    """
    groups = []
    for ov in overrides:
        key, vals = ov.split("=", 1)
        groups.append([f"{key}={v}" for v in vals.split(",")])
    return [list(combo) for combo in itertools.product(*groups)]


def run_sweep(
    preset: str,
    overrides: Sequence[str],
    run_fn: Optional[Callable[[Config], Dict[str, float]]] = None,
    metric: str = "w2",
) -> List[Dict]:
    """Grid multirun. ``run_fn(cfg) -> metrics dict``; default trains the
    harness Trainer and evaluates. Returns one record per run with its
    overrides, metrics, and any error."""
    if run_fn is None:
        def run_fn(cfg):
            from .trainer import Trainer

            t = Trainer(cfg)
            t.fit()
            return t.evaluate()

    records = []
    for combo in expand_grid(overrides):
        rec: Dict = {"overrides": combo}
        try:
            cfg = load_config(preset, combo)
            cfg.name = f"{cfg.name}_" + "_".join(c.split("=")[1] for c in combo)[:60]
            rec["metrics"] = run_fn(cfg)
            rec["objective"] = rec["metrics"].get(metric)
        except Exception as e:  # sweep resilience: record, continue
            rec["error"] = f"{type(e).__name__}: {e}"
            rec["traceback"] = traceback.format_exc()
        records.append(rec)
    return records


def random_search(
    preset: str,
    space: Dict[str, Callable[[random.Random], object]],
    n_trials: int,
    run_fn: Optional[Callable[[Config], Dict[str, float]]] = None,
    metric: str = "w2",
    minimize: bool = True,
    seed: int = 0,
) -> Tuple[Dict, List[Dict]]:
    """Random hparam search (the optuna-config role with zero dependencies).

    ``space`` maps override keys to samplers, e.g.
        {"optim.lr": lambda r: 10 ** r.uniform(-4.5, -2.5)}
    Returns (best record, all records).
    """
    rng = random.Random(seed)
    trials = []
    for _ in range(n_trials):
        combo = [f"{k}={sampler(rng)}" for k, sampler in space.items()]
        trials.append(run_sweep(preset, combo, run_fn=run_fn, metric=metric)[0])
    scored = [t for t in trials if t.get("objective") is not None]
    if not scored:
        return {}, trials
    best = (min if minimize else max)(scored, key=lambda t: t["objective"])
    return best, trials


def log_uniform(lo: float, hi: float) -> Callable[[random.Random], float]:
    return lambda r: 10 ** r.uniform(math.log10(lo), math.log10(hi))


def choice(*options) -> Callable[[random.Random], object]:
    return lambda r: r.choice(options)
