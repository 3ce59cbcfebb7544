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
    load_h5ad_timeseries,
    load_npz_timeseries,
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
    p.add_argument("--dim", type=int, default=5, help="PCA dims to keep")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--leaveout", type=int, default=-1)
    p.add_argument("--sigma", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    key = jax.random.PRNGKey(args.seed)
    if args.h5ad:
        marginals, times = load_h5ad_timeseries(args.h5ad, max_dim=args.dim)
        marginals, _, _ = whiten(marginals)
    elif args.npz:
        marginals, times = load_npz_timeseries(args.npz, max_dim=args.dim)
        marginals, _, _ = whiten(marginals)
    else:
        X = np.asarray(tree_population(key, 4096, T=5, dim=2))
        marginals = [X[:, t] for t in range(5)]
        times = np.arange(5.0)
    T = len(marginals)
    dim = marginals[0].shape[1]
    print(f"{T} timepoints, dim {dim}, sizes {[m.shape[0] for m in marginals]}")

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

    def loss_fn(params, key, X):
        k_seg, k_fm = jax.random.split(key)
        x0, x1, t_sel = sample_segment_pairs(
            k_seg, X, leaveout_timepoint=args.leaveout, training=True
        )
        t, xt, ut = matcher.sample_location_and_conditional_flow(k_fm, x0, x1)
        ut, t = leaveout_adjusted_targets(ut, t, t_sel, args.leaveout)
        vt = model.apply(params, t + t_sel, xt)  # net sees global time
        return jnp.mean(jnp.square(vt - ut))

    @jax.jit
    def step(state, key, X):
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
        X = resample_to_trajectory(kb, marginals, args.batch)
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
