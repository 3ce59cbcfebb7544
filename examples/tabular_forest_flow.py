"""Forest-Flow: flow matching with gradient-boosted trees as the vector field.

Counterpart of the reference's tabular examples
(/root/reference/examples/tabular/*.ipynb, README.md:1-22): learn the I-CFM
conditional vector field u_t = x1 - x0 at discretized time levels with a
tree ensemble instead of a neural net, then generate by Euler integration of
the per-level regressors. The reference uses XGBoost; this environment ships
scikit-learn, whose HistGradientBoostingRegressor is the same histogram-GBDT
family. (The generation loop is host-side by nature — trees don't jit; the
framework's role here is the CFM path construction and the evaluation
metrics.)

Usage: python examples/tabular_forest_flow.py [--n_t 20] [--steps 100]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_t", type=int, default=20, help="time discretization levels")
    p.add_argument("--dup", type=int, default=30,
                   help="noise duplications per data point (Forest-Flow K)")
    p.add_argument("--steps", type=int, default=100, help="Euler steps at generation")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from sklearn.datasets import load_iris
    from sklearn.ensemble import HistGradientBoostingRegressor

    import jax
    import jax.numpy as jnp

    from cfm_tpu import ConditionalFlowMatcher
    from cfm_tpu.coupling import wasserstein

    rng = np.random.default_rng(args.seed)
    X = load_iris().data.astype(np.float32)
    mu, sd = X.mean(0), X.std(0) + 1e-8
    X = (X - mu) / sd
    n, d = X.shape

    # Build training sets per time level: for each level t_k, pair every data
    # point with `dup` noise draws, form xt and the I-CFM target u = x1 - x0.
    FM = ConditionalFlowMatcher(sigma=0.0)
    key = jax.random.PRNGKey(args.seed)
    t_levels = np.linspace(0.0, 1.0, args.n_t, endpoint=False)
    x1 = np.repeat(X, args.dup, axis=0)
    x0 = rng.standard_normal(x1.shape).astype(np.float32)

    models = []  # one regressor per (time level, output dim)
    for k, t in enumerate(t_levels):
        tb = jnp.full((x1.shape[0],), float(t))
        xt = np.asarray(FM.sample_xt(jnp.asarray(x0), jnp.asarray(x1), tb,
                                     jnp.zeros_like(jnp.asarray(x0))))
        ut = x1 - x0
        level = []
        for j in range(d):
            reg = HistGradientBoostingRegressor(max_iter=50, random_state=args.seed)
            reg.fit(xt, ut[:, j])
            level.append(reg)
        models.append(level)
        if k % 5 == 0:
            print(f"fitted level {k}/{args.n_t}")

    # Generate: Euler over the piecewise-constant-in-time forest field.
    m = 500
    x = rng.standard_normal((m, d)).astype(np.float32)
    dt = 1.0 / args.steps
    for s in range(args.steps):
        t = s * dt
        k = min(int(t * args.n_t), args.n_t - 1)
        v = np.stack([models[k][j].predict(x) for j in range(d)], axis=1)
        x = x + dt * v.astype(np.float32)

    w2 = float(wasserstein(jnp.asarray(x[: len(X)]), jnp.asarray(X[: len(x)]), power=2))
    base = float(wasserstein(
        jnp.asarray(rng.standard_normal((len(X), d)).astype(np.float32)),
        jnp.asarray(X), power=2))
    print(f"iris (whitened): generated-vs-data W2 = {w2:.3f} (noise baseline {base:.3f})")
    assert w2 < base, "forest flow failed to move toward the data"


if __name__ == "__main__":
    main()
