"""2-D flow matching end to end: 8gaussians -> moons.

CLI counterpart of the reference's 2D tutorial notebooks
(/root/reference/examples/2D_tutorials/training-8gaussians-to-moons.ipynb):
train any of the matchers with a 3x64 SELU MLP, generate with the ODE/SDE
solvers, report 2-moons W1/W2.

Usage:
  python examples/train_2d.py --matcher otcfm --steps 2000 --batch 256
  python examples/train_2d.py --matcher sbcfm --sde   # SF2M-style score head
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cfm_tpu import (
    ConditionalFlowMatcher,
    ExactOptimalTransportConditionalFlowMatcher,
    SchrodingerBridgeConditionalFlowMatcher,
    TargetConditionalFlowMatcher,
    VariancePreservingConditionalFlowMatcher,
)
from cfm_tpu.coupling import wasserstein
from cfm_tpu.data import eight_gaussians, sample_moons
from cfm_tpu.eval.metrics import compute_distribution_distances
from cfm_tpu.integrate import FlowSolver, odeint, vector_field_from_model
from cfm_tpu.models import MLP
from cfm_tpu.train import init_train_state, make_optimizer, make_train_step

MATCHERS = {
    "icfm": lambda sigma: ConditionalFlowMatcher(sigma=sigma),
    "otcfm": lambda sigma: ExactOptimalTransportConditionalFlowMatcher(sigma=sigma),
    "fm": lambda sigma: TargetConditionalFlowMatcher(sigma=sigma),
    "sbcfm": lambda sigma: SchrodingerBridgeConditionalFlowMatcher(sigma=max(sigma, 0.1)),
    "vpcfm": lambda sigma: VariancePreservingConditionalFlowMatcher(sigma=sigma),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--matcher", default="otcfm", choices=sorted(MATCHERS))
    p.add_argument("--sigma", type=float, default=0.1)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sde", action="store_true",
                   help="train a score head too and sample via SDE (SF2M)")
    p.add_argument("--ode-method", default="euler",
                   choices=["euler", "midpoint", "rk4", "dopri5"])
    args = p.parse_args()

    matcher = MATCHERS[args.matcher](args.sigma)
    model = MLP(dim=2, w=64)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    score_model = MLP(dim=2, w=64) if args.sde else None
    if args.sde:
        score_params = score_model.init(
            jax.random.fold_in(key, 1), jnp.zeros((2,)), jnp.zeros((2, 2))
        )
        params = {"flow": params, "score": score_params}

    opt = make_optimizer(lr=args.lr, warmup_steps=0, grad_clip=1.0)
    state = init_train_state(params, opt)
    step = jax.jit(
        make_train_step(
            matcher,
            model.apply,
            opt,
            ema_decay=0.99,
            score_apply_fn=score_model.apply if args.sde else None,
        )
    )

    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k0, k1, ks = jax.random.split(key, 4)
        x0 = eight_gaussians(k0, args.batch)
        x1 = sample_moons(k1, args.batch)
        state, metrics = step(state, ks, x0, x1)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i:5d}  loss {float(metrics['loss']):.4f}")
    dt = time.perf_counter() - t0
    print(f"trained {args.steps} steps in {dt:.1f}s ({args.steps / dt:.1f} steps/s)")

    # Generation + eval.
    n_eval = 2048
    key, kg, kt = jax.random.split(key, 3)
    x0 = eight_gaussians(kg, n_eval)
    target = sample_moons(kt, n_eval)
    flow_params = state.ema_params["flow"] if args.sde else state.ema_params
    f = vector_field_from_model(model.apply, flow_params)
    if args.sde:
        s = vector_field_from_model(score_model.apply, state.ema_params["score"])
        solver = FlowSolver(drift=f, score=s, sigma=args.sigma if args.sigma > 0 else 0.1)
        gen = solver.sdeint(jax.random.fold_in(key, 2), x0,
                            jnp.linspace(0, 1, 101)).final
        label = "SDE"
    else:
        sol = odeint(f, x0, jnp.linspace(0, 1, 101), method=args.ode_method)
        gen, label = sol.final, f"ODE/{args.ode_method} (nfe {int(sol.nfe)})"

    w1 = float(wasserstein(gen, target, power=1))
    w2 = float(wasserstein(gen, target, power=2))
    w2_src = float(wasserstein(x0, target, power=2))
    print(f"[{args.matcher}] {label}: 2-moons W1={w1:.3f} W2={w2:.3f} "
          f"(source W2={w2_src:.3f})")


if __name__ == "__main__":
    main()
