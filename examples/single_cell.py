"""Single-cell trajectory interpolation with OT-CFM / SF2M.

CLI counterpart of /root/reference/examples/single_cell/
single-cell_example.ipynb: interpolate between scRNA timepoints (embryoid
body) with OT-CFM, evaluate held-out timepoints with the W1/W2/MMD suite.
Works with any h5ad (obsm X_pca + day labels) or npz time-series; with no
file it runs the synthetic tree population so the recipe is testable
end to end.

Usage:
  python examples/single_cell.py --h5ad data/eb.h5ad --leaveout 2
  python examples/single_cell.py --synthetic --steps 1000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
from cfm_tpu.data.trajectory import (
    leaveout_adjusted_targets,
    load_h5ad_joint_plans,
    load_h5ad_timeseries,
    load_npz_timeseries,
    make_joint_plan_sampler,
    resample_to_trajectory,
    sample_segment_pairs,
    tree_population,
    whiten,
)
from cfm_tpu.eval.metrics import compute_distribution_distances
from cfm_tpu.integrate import odeint
from cfm_tpu.models import MLP
from cfm_tpu.train import init_train_state, make_optimizer


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--h5ad", default=None)
    p.add_argument("--npz", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n", type=int, default=4096,
                   help="synthetic population size per timepoint")
    p.add_argument("--dim", type=int, default=5, help="PCA dims to keep")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--leaveout", type=int, default=-1)
    p.add_argument("--sigma", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--joint-plans", action="store_true",
                   help="train from PRECOMPUTED per-segment OT plans "
                        "(geodesic datamodule parity: adata.uns['pi_{t}_{t+1}'] "
                        "from --h5ad, or exact plans solved once up front in "
                        "synthetic mode) instead of re-solving OT per batch")
    args = p.parse_args()

    key = jax.random.PRNGKey(args.seed)
    if args.h5ad:
        marginals, times = load_h5ad_timeseries(args.h5ad, max_dim=args.dim)
        marginals, _, _ = whiten(marginals)
    elif args.npz:
        marginals, times = load_npz_timeseries(args.npz, max_dim=args.dim)
        marginals, _, _ = whiten(marginals)
    else:
        X = np.asarray(tree_population(key, args.n, T=5, dim=2))
        marginals = [X[:, t] for t in range(5)]
        times = np.arange(5.0)
    T = len(marginals)
    dim = marginals[0].shape[1]
    print(f"{T} timepoints, dim {dim}, sizes {[m.shape[0] for m in marginals]}")

    plan_sample = None
    if args.joint_plans:
        # Geodesic datamodule parity (distribution_datamodule.py:190-281):
        # pairs come from precomputed joint plans, no per-batch OT solve.
        if args.h5ad:
            plans, straddle = load_h5ad_joint_plans(
                args.h5ad, T, leaveout=args.leaveout > 0
            )
        else:
            from cfm_tpu.coupling import OTPlanSampler

            solver = OTPlanSampler(method="exact")
            plans = [np.asarray(solver.get_map(jnp.asarray(marginals[t]),
                                               jnp.asarray(marginals[t + 1])))
                     for t in range(T - 1)]
            straddle = (
                [np.asarray(solver.get_map(jnp.asarray(marginals[t]),
                                           jnp.asarray(marginals[t + 2])))
                 for t in range(T - 2)]
                if args.leaveout > 0 else None
            )
            print("solved", len(plans), "joint plans up front (synthetic mode)")
        plan_sample = make_joint_plan_sampler(
            marginals, plans, leaveout_timepoint=args.leaveout,
            straddle_plans=straddle,
        )

    matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=args.sigma)
    model = MLP(dim=dim, w=64)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, dim)))
    opt = make_optimizer(lr=1e-3, warmup_steps=0)
    state = init_train_state(params, opt)

    # Trajectory-aware train step: sample a (bs, T, D) population batch,
    # choose per-sample timepoint pairs (skipping the left-out timepoint),
    # OT-couple within each pair, regress the segment-local velocity — the
    # reference CFMLitModule.preprocess_batch/step pipeline
    # (cfm_module.py:142-263) as one fused function.
    import optax

    # With precomputed joint plans the pairs are already coupled; skip the
    # matcher's per-batch OT re-solve (path math unchanged).
    inner = matcher.without_coupling() if plan_sample is not None else matcher

    def loss_fn(params, key, X):
        k_seg, k_fm = jax.random.split(key)
        if plan_sample is not None:
            x0, x1, t_sel = plan_sample(k_seg, args.batch)
        else:
            x0, x1, t_sel = sample_segment_pairs(
                k_seg, X, leaveout_timepoint=args.leaveout, training=True
            )
        t, xt, ut = inner.sample_location_and_conditional_flow(k_fm, x0, x1)
        ut, t = leaveout_adjusted_targets(ut, t, t_sel, args.leaveout)
        vt = model.apply(params, t + t_sel, xt)  # net sees global time
        return jnp.mean(jnp.square(vt - ut))

    @jax.jit
    def step(state, key, X=None):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, key, X)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        from cfm_tpu.utils import ema_update
        return state._replace(
            params=new_params,
            ema_params=ema_update(state.ema_params, new_params, 0.99),
            opt_state=opt_state,
            step=state.step + 1,
        ), loss

    for i in range(args.steps):
        key, kb, ks = jax.random.split(key, 3)
        X = (resample_to_trajectory(kb, marginals, args.batch)
             if plan_sample is None else None)
        state, loss = step(state, ks, X)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i:5d}  loss {float(loss):.4f}")

    # Evaluate: roll the ODE from t=0 through all timepoints; compare each
    # marginal (the reference's forward_eval_integrate, cfm_module.py:388-472).
    def f(t, x):
        return model.apply(state.ema_params, jnp.full((x.shape[0],), t, x.dtype), x)

    n_eval = min(1000, min(m.shape[0] for m in marginals))
    key, ke = jax.random.split(key)
    x = jnp.asarray(marginals[0][:n_eval])
    preds = []
    for seg in range(T - 1):
        ts = jnp.linspace(float(seg), float(seg + 1), 51)
        x = odeint(f, x, ts, method="rk4", return_trajectory=False).final
        preds.append(x)
    trues = [jnp.asarray(m[:n_eval]) for m in marginals[1:]]
    names, vals = compute_distribution_distances(preds, trues)
    for n, v in zip(names[-8:], vals[-8:]):
        print(f"  {n}: {v:.4f}")
    if args.leaveout > 0:
        i = args.leaveout - 1  # preds[i] is the t=leaveout marginal
        w2 = vals[names.index(f"t{args.leaveout}/2-Wasserstein")] if T > 2 else None
        print(f"held-out timepoint {args.leaveout} W2: {w2}")


if __name__ == "__main__":
    main()
