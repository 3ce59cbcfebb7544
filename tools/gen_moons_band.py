"""Derive the reference 2-moons W2 acceptance band (VERDICT round-1 item 9).

Trains an INDEPENDENT torch-CPU re-implementation of the reference's 2D
tutorial recipe (/root/reference/examples/2D_tutorials/
Flow_matching_tutorial.ipynb: MLP(dim=2, w=64, time_varying), batch 256,
Adam default lr, 20k steps, 8gaussians->moons) for each of the five
matchers over several seeds, evaluates the 2-moons W2 (exact assignment on
1024-sample clouds, euler-100 generation — the same protocol as
cfm_tpu.eval.metrics / Trainer.evaluate), and writes the per-matcher
distribution to tests/fixtures/moons_w2_band.json.

This file shares NO code with either the reference (whose torchcfm/torchdyn
dependencies are absent here) or with cfm_tpu — it is straight-line torch +
scipy, so the band it produces is an independent oracle of the quality the
reference recipe reaches. The committed band backs the regression test in
tests/test_quality_band.py: a matcher whose W2 drifts above
mean + 4*std (+ MC margin) fails.

Run offline from the repo root: python tools/gen_moons_band.py
(~25 min CPU). Deterministic per seed.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import scipy.optimize
import torch

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "moons_w2_band.json")

STEPS = 20000
BATCH = 256
SEEDS = (0, 1, 2, 3, 4)
EVAL_N = 1024


# --- data (reference torchcfm/utils.py:11-38 semantics) --------------------


def sample_8gaussians(n, gen):
    centers = torch.tensor(
        [
            (1, 0), (-1, 0), (0, 1), (0, -1),
            (1 / math.sqrt(2), 1 / math.sqrt(2)),
            (1 / math.sqrt(2), -1 / math.sqrt(2)),
            (-1 / math.sqrt(2), 1 / math.sqrt(2)),
            (-1 / math.sqrt(2), -1 / math.sqrt(2)),
        ],
        dtype=torch.float32,
    ) * 5.0
    idx = torch.randint(0, 8, (n,), generator=gen)
    return centers[idx] + torch.randn(n, 2, generator=gen) * math.sqrt(0.1)


def sample_moons(n, gen):
    """torchdyn generate_moons * 3 - 1 (reference utils.py:25-32)."""
    n_out = n // 2
    n_in = n - n_out
    theta_out = torch.rand(n_out, generator=gen) * math.pi
    theta_in = torch.rand(n_in, generator=gen) * math.pi
    outer = torch.stack([torch.cos(theta_out), torch.sin(theta_out)], -1)
    inner = torch.stack([1 - torch.cos(theta_in), 1 - torch.sin(theta_in) - 0.5], -1)
    x = torch.cat([outer, inner], 0)
    x = x + 0.1 * torch.randn(n, 2, generator=gen)
    return x * 3.0 - 1.0


# --- model (reference torchcfm/models/models.py:4-21) ----------------------


def make_mlp(gen):
    torch.manual_seed(int(torch.randint(0, 2**31 - 1, (1,), generator=gen)))
    return torch.nn.Sequential(
        torch.nn.Linear(3, 64), torch.nn.SELU(),
        torch.nn.Linear(64, 64), torch.nn.SELU(),
        torch.nn.Linear(64, 64), torch.nn.SELU(),
        torch.nn.Linear(64, 2),
    )


# --- couplings -------------------------------------------------------------


def exact_plan_resample(x0, x1, gen):
    """pot.emd + sample_map with replacement (optimal_transport.py:99-145):
    the exact plan on uniform equal marginals is a permutation, so sampling
    the flattened plan = drawing source rows i with replacement, pairing
    with perm(i)."""
    M = torch.cdist(x0, x1) ** 2
    rows, cols = scipy.optimize.linear_sum_assignment(M.numpy())
    draw = torch.randint(0, x0.shape[0], (x0.shape[0],), generator=gen)
    return x0[rows[draw]], x1[cols[draw]]


def sinkhorn_plan_resample(x0, x1, reg, gen):
    """pot.sinkhorn plan + categorical resampling (method='sinkhorn')."""
    n = x0.shape[0]
    M = (torch.cdist(x0, x1) ** 2).numpy().astype(np.float64)
    a = np.full(n, 1.0 / n)
    K = np.exp(-M / reg)
    u = np.ones(n)
    for _ in range(2000):
        u_new = a / (K @ (a / (K.T @ u)))
        if np.max(np.abs(u_new - u)) < 1e-12:
            u = u_new
            break
        u = u_new
    v = a / (K.T @ u)
    plan = u[:, None] * K * v[None, :]
    p = torch.tensor(plan.ravel() / plan.sum(), dtype=torch.float32)
    draw = torch.multinomial(p, n, replacement=True, generator=gen)
    return x0[draw // n], x1[draw % n]


# --- paths (torchcfm/conditional_flow_matching.py formulas) ----------------


def path_sample(kind, x0, x1, t, sigma, gen):
    eps = torch.randn(x0.shape, generator=gen)
    tp = t[:, None]
    if kind in ("icfm", "otcfm", "sbcfm"):
        mu = tp * x1 + (1 - tp) * x0
        if kind == "sbcfm":
            st = sigma * torch.sqrt(tp * (1 - tp))
            xt = mu + st * eps
            ut = (1 - 2 * tp) / (2 * tp * (1 - tp) + 1e-8) * (xt - mu) + x1 - x0
        else:
            xt = mu + sigma * eps
            ut = x1 - x0
        return xt, ut
    if kind == "fm":  # Lipman target FM: mu=t*x1, sigma_t = 1-(1-sigma)t
        st = 1 - (1 - sigma) * tp
        xt = tp * x1 + st * eps
        ut = (x1 - (1 - sigma) * xt) / st
        return xt, ut
    if kind == "vpcfm":
        c, s = torch.cos(math.pi * tp / 2), torch.sin(math.pi * tp / 2)
        xt = c * x0 + s * x1 + sigma * eps
        ut = math.pi / 2 * (c * x1 - s * x0)
        return xt, ut
    raise ValueError(kind)


def w2_exact(a, b):
    M = (torch.cdist(a, b) ** 2).numpy()
    r, c = scipy.optimize.linear_sum_assignment(M)
    return float(np.sqrt(M[r, c].mean()))


def run_one(kind, seed):
    gen = torch.Generator().manual_seed(seed)
    model = make_mlp(gen)
    opt = torch.optim.Adam(model.parameters())
    sigma = {"icfm": 0.1, "otcfm": 0.1, "sbcfm": 1.0, "fm": 0.1, "vpcfm": 0.1}[kind]
    gaussian_source = kind == "fm"
    for _ in range(STEPS):
        x0 = (torch.randn(BATCH, 2, generator=gen) if gaussian_source
              else sample_8gaussians(BATCH, gen))
        x1 = sample_moons(BATCH, gen)
        if kind == "otcfm":
            x0, x1 = exact_plan_resample(x0, x1, gen)
        elif kind == "sbcfm":
            x0, x1 = sinkhorn_plan_resample(x0, x1, 2 * sigma**2, gen)
        t = torch.rand(BATCH, generator=gen)
        xt, ut = path_sample(kind, x0, x1, t, sigma, gen)
        vt = model(torch.cat([xt, t[:, None]], -1))
        loss = torch.mean((vt - ut) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
    # euler-100 generation (utils_cifar.py-style protocol, matches
    # Trainer.evaluate's default)
    with torch.no_grad():
        x = (torch.randn(EVAL_N, 2, generator=gen) if gaussian_source
             else sample_8gaussians(EVAL_N, gen))
        dt = 1.0 / 100
        for i in range(100):
            t = torch.full((EVAL_N, 1), i * dt)
            x = x + dt * model(torch.cat([x, t], -1))
    target = sample_moons(EVAL_N, gen)
    return w2_exact(x, target)


def main():
    kinds = sys.argv[1:] or ["icfm", "otcfm", "sbcfm", "fm", "vpcfm"]
    out = {}
    if os.path.exists(OUT):
        out = json.load(open(OUT))
    for kind in kinds:
        # Reuse committed per-seed results (runs are deterministic per seed)
        # so extending the seed set only costs the new seeds.
        have = {}
        if kind in out and out[kind].get("steps") == STEPS:
            have = dict(zip(out[kind]["seeds"], out[kind]["w2"]))
        vals = []
        for seed in SEEDS:
            if seed in have:
                vals.append(have[seed])
                print(f"{kind} seed {seed}: W2={have[seed]:.4f}  (reused)", flush=True)
                continue
            t0 = time.time()
            w2 = run_one(kind, seed)
            vals.append(w2)
            print(f"{kind} seed {seed}: W2={w2:.4f}  ({time.time()-t0:.0f}s)", flush=True)
        out[kind] = {
            "seeds": list(SEEDS), "w2": vals,
            "mean": float(np.mean(vals)), "std": float(np.std(vals)),
            "steps": STEPS, "batch": BATCH, "eval_n": EVAL_N,
            "protocol": "euler-100, exact-assignment W2, 1024 clouds",
        }
        json.dump(out, open(OUT, "w"), indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
