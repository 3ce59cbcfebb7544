"""Generate the tutorial notebooks in examples/notebooks/.

Notebook-form counterparts of the reference's tutorials
(/root/reference/examples/2D_tutorials/*.ipynb, examples/images/*.ipynb),
re-written against the cfm_tpu API. Kept as a generator script so the .ipynb
files stay reproducible and diff-able; run

    python tools/gen_notebooks.py [--execute]

to (re)build them. --execute runs every notebook end to end with nbclient
(CPU-friendly step counts) and embeds the outputs.
"""

from __future__ import annotations

import argparse
import os

import nbformat as nbf

OUT = os.path.join(os.path.dirname(__file__), "..", "examples", "notebooks")


def nb(cells):
    n = nbf.v4.new_notebook()
    n.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    n.cells = cells
    return n


def md(src):
    return nbf.v4.new_markdown_cell(src)


def code(src):
    return nbf.v4.new_code_cell(src)


# ---------------------------------------------------------------------------
# 1. Flow matching tutorial: 8gaussians -> moons with I-CFM / OT-CFM / SB-CFM
# ---------------------------------------------------------------------------

FLOW_MATCHING = nb([
    md("""# Conditional flow matching on 2D toys: I-CFM, OT-CFM, SB-CFM

TPU-native notebook counterpart of the reference tutorial
(`examples/2D_tutorials/Flow_matching_tutorial.ipynb` in
atong01/conditional-flow-matching): train a small MLP vector field to
transport 8 Gaussians onto two moons with three matchers, then compare the
learned flows.

Everything — the minibatch OT coupling included — runs inside one jitted
step with explicit PRNG keys; there is no host round-trip per batch."""),
    code("""import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt

from cfm_tpu import (
    ConditionalFlowMatcher,
    ExactOptimalTransportConditionalFlowMatcher,
    SchrodingerBridgeConditionalFlowMatcher,
)
from cfm_tpu.coupling import wasserstein
from cfm_tpu.data import eight_gaussians, sample_moons
from cfm_tpu.integrate import odeint, vector_field_from_model
from cfm_tpu.models import MLP
from cfm_tpu.train import init_train_state, make_optimizer, make_train_step"""),
    md("""## Training loop

One function trains any matcher: sample a source/target minibatch, let the
matcher couple + sample `(t, x_t, u_t)`, regress the MLP on `u_t`."""),
    code("""def train(matcher, steps=600, batch=256, lr=2e-3, seed=0):
    model = MLP(dim=2, w=64)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=lr, warmup_steps=0, grad_clip=1.0)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(matcher, model.apply, opt, ema_decay=0.99))
    for i in range(steps):
        key, k0, k1, ks = jax.random.split(key, 4)
        x0 = eight_gaussians(k0, batch)
        x1 = sample_moons(k1, batch)
        state, metrics = step(state, ks, x0, x1)
        if i % (steps // 5) == 0:
            print(f"  step {i:4d}  loss {float(metrics['loss']):.4f}")
    return model, state

matchers = {
    "I-CFM": ConditionalFlowMatcher(sigma=0.1),
    "OT-CFM": ExactOptimalTransportConditionalFlowMatcher(sigma=0.1),
    "SB-CFM": SchrodingerBridgeConditionalFlowMatcher(sigma=0.5),
}
trained = {}
for name, matcher in matchers.items():
    print(name)
    trained[name] = train(matcher)"""),
    md("""## Generation and trajectories

Integrate the learned fields from the source distribution with the
`lax.scan` euler integrator and plot the sample paths."""),
    code("""key = jax.random.PRNGKey(42)
k_src, k_tgt = jax.random.split(key)
n = 1024
x0 = eight_gaussians(k_src, n)
target = sample_moons(k_tgt, n)
ts = jnp.linspace(0, 1, 101)

fig, axes = plt.subplots(1, 3, figsize=(12, 4))
for ax, (name, (model, state)) in zip(axes, trained.items()):
    f = vector_field_from_model(model.apply, state.ema_params)
    sol = odeint(f, x0, ts, method="euler")
    traj = sol.ys  # (T, n, 2)
    ax.plot(traj[:, :128, 0], traj[:, :128, 1], c="olive", lw=0.3, alpha=0.4)
    ax.scatter(traj[0, :, 0], traj[0, :, 1], s=3, c="black", label="x0")
    ax.scatter(traj[-1, :, 0], traj[-1, :, 1], s=3, c="blue", label="x1")
    w2 = float(wasserstein(sol.final, target, power=2))
    ax.set_title(f"{name}  W2={w2:.3f}")
    ax.legend(loc="lower left", fontsize=7)
plt.tight_layout()
plt.show()"""),
    md("""OT-CFM's paths are visibly straighter than I-CFM's — the minibatch
OT coupling removes most of the conditional-path crossing, which is the
whole point (lower target variance, faster inference with fewer steps)."""),
])

# ---------------------------------------------------------------------------
# 2. SF2M tutorial: joint flow + score, ODE and SDE sampling
# ---------------------------------------------------------------------------

SF2M = nb([
    md("""# [SF]²M: simulation-free Schrödinger bridge matching

Counterpart of the reference `SF2M_tutorial.ipynb`: jointly train a flow
field `v(t, x)` and a score field `s(t, x)` on the Brownian-bridge path of
the Schrödinger-bridge matcher, then sample with BOTH the probability-flow
ODE and the bridge SDE.

The score target uses the noise that generated `x_t`
(`return_noise=True` in the reference) and the λ(t) weighting
(`compute_lambda`)."""),
    code("""import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt

from cfm_tpu import SchrodingerBridgeConditionalFlowMatcher
from cfm_tpu.coupling import wasserstein
from cfm_tpu.data import eight_gaussians, sample_moons
from cfm_tpu.integrate import FlowSolver, vector_field_from_model
from cfm_tpu.models import MLP
from cfm_tpu.train import init_train_state, make_optimizer, make_train_step"""),
    code("""sigma = 0.5
matcher = SchrodingerBridgeConditionalFlowMatcher(sigma=sigma)
flow = MLP(dim=2, w=64)
score = MLP(dim=2, w=64)

key = jax.random.PRNGKey(0)
params = {
    "flow": flow.init(key, jnp.zeros((2,)), jnp.zeros((2, 2))),
    "score": score.init(jax.random.fold_in(key, 1), jnp.zeros((2,)), jnp.zeros((2, 2))),
}
opt = make_optimizer(lr=2e-3, warmup_steps=0, grad_clip=1.0)
state = init_train_state(params, opt)
# score_apply_fn switches the step to the joint flow+score loss
# (flow MSE + mean((lambda_t * s + eps)^2), the reference's SF2M cell).
step = jax.jit(make_train_step(matcher, flow.apply, opt, ema_decay=0.99,
                               score_apply_fn=score.apply))

for i in range(800):
    key, k0, k1, ks = jax.random.split(key, 4)
    x0 = eight_gaussians(k0, 256)
    x1 = sample_moons(k1, 256)
    state, metrics = step(state, ks, x0, x1)
    if i % 160 == 0:
        print(f"step {i:4d}  loss {float(metrics['loss']):.4f}")"""),
    md("""## Sampling: probability-flow ODE vs bridge SDE

The `FlowSolver` mirrors the reference solver: ODE drift is `v`, the SDE
adds the score (`f = v + s`, diffusion `g = σ(t)`) integrated with keyed
Euler–Maruyama."""),
    code("""n = 1024
key, kg, kt, kn = jax.random.split(key, 4)
x0 = eight_gaussians(kg, n)
target = sample_moons(kt, n)
ts = jnp.linspace(0, 1, 101)

f = vector_field_from_model(flow.apply, state.ema_params["flow"])
s = vector_field_from_model(score.apply, state.ema_params["score"])
solver = FlowSolver(drift=f, score=s, sigma=sigma)

ode = solver.odeint(x0, ts)
sde = solver.sdeint(kn, x0, ts)

fig, axes = plt.subplots(1, 2, figsize=(9, 4))
for ax, (label, xs) in zip(axes, [("ODE", ode.final), ("SDE", sde.final)]):
    ax.scatter(target[:, 0], target[:, 1], s=3, c="grey", alpha=0.4, label="target")
    ax.scatter(xs[:, 0], xs[:, 1], s=3, c="blue", label=label)
    ax.set_title(f"{label}  W2={float(wasserstein(xs, target, power=2)):.3f}")
    ax.legend(fontsize=7)
plt.tight_layout()
plt.show()"""),
])

# ---------------------------------------------------------------------------
# 3. Maximum-likelihood CNF tutorial
# ---------------------------------------------------------------------------

CNF = nb([
    md("""# Exact-likelihood CNF: training and evaluation

Counterpart of `Maximum_likelihood_CNF_tutorial.ipynb`: instead of
regressing a conditional vector field, train the flow by maximizing exact
log-likelihood through the augmented (trace-carrying) ODE — and afterwards
evaluate `log p(x)` of held-out data with the same machinery.

The divergence is integrated as an extra scan-carry channel
(`cfm_tpu.augment.augmented_odeint`), exactly the role of the reference's
`AugmentationModule` + `CNFReg`."""),
    code("""import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import optax

from cfm_tpu.augment import cnf_log_likelihood
from cfm_tpu.data import sample_moons
from cfm_tpu.models import MLP
from cfm_tpu.variants import make_cnf_nll_loss"""),
    code("""model = MLP(dim=2, w=64)
key = jax.random.PRNGKey(0)
params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))

# Negative log-likelihood loss: integrate x1 backward 1->0 with the exact
# trace; NLL = -[log N(x0) + int tr J dt].
nll_loss = make_cnf_nll_loss(model.apply, n_steps=40, divergence="exact")
opt = optax.adam(2e-3)
opt_state = opt.init(params)

@jax.jit
def train_step(params, opt_state, key, x1):
    (loss, _), grads = jax.value_and_grad(
        lambda p: nll_loss(p, key, None, x1), has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss

for i in range(300):
    key, kd, ks = jax.random.split(key, 3)
    x1 = sample_moons(kd, 128)
    params, opt_state, loss = train_step(params, opt_state, ks, x1)
    if i % 60 == 0:
        print(f"step {i:4d}  nll {float(loss):.4f}")"""),
    md("""## Log-likelihood landscape

Evaluate `log p(x)` on a grid: the learned CNF should put mass on the two
moons."""),
    code("""xs = jnp.linspace(-1.5, 2.5, 60)
ys = jnp.linspace(-1.0, 1.5, 60)
grid = jnp.stack(jnp.meshgrid(xs, ys), -1).reshape(-1, 2)

def f(t, x):
    return model.apply(params, t, x)

logp = cnf_log_likelihood(f, grid, n_steps=60, divergence="exact")
plt.figure(figsize=(5, 4))
plt.imshow(jnp.exp(logp).reshape(60, 60), origin="lower",
           extent=[-1.5, 2.5, -1.0, 1.5], cmap="viridis", aspect="auto")
data = sample_moons(jax.random.PRNGKey(7), 512)
plt.scatter(data[:, 0], data[:, 1], s=2, c="white", alpha=0.5)
plt.title("exp(log p(x)) of the trained CNF")
plt.colorbar()
plt.show()"""),
])

# ---------------------------------------------------------------------------
# 4. Conditional MNIST
# ---------------------------------------------------------------------------

COND_MNIST = nb([
    md("""# Class-conditional MNIST with guided OT-CFM

Counterpart of `examples/images/conditional_mnist.ipynb`: couple the
minibatch with exact OT **carrying the labels through the plan**
(`guided_sample_location_and_conditional_flow`), feed the label to the
UNet's class embedding, and generate digits row-by-row by class.

This cell uses the high-level `Trainer` harness; set `SYNTHETIC = False`
and put the MNIST idx files under `data/` to train on real digits. The
default settings are a fast CPU-friendly smoke configuration — raise
`STEPS` (2000+) and the UNet width for real sample quality."""),
    code("""import jax
import jax.numpy as jnp

from cfm_tpu.config import load_config
from cfm_tpu.eval.plotting import image_grid
from cfm_tpu.trainer import Trainer

SYNTHETIC = True   # flip to False with real MNIST idx files under data/
STEPS = 30         # smoke default; use 2000+ for real digits

cfg = load_config("mnist_otcfm_cond", [
    f"trainer.total_steps={STEPS}",
    "data.batch_size=64",
    f"data.synthetic_fallback={SYNTHETIC}",
    "model.num_channels=16",
    "trainer.ckpt_dir=results/nb_cond_mnist/checkpoints",
])
trainer = Trainer(cfg, log_dir="results/nb_cond_mnist/logs")
trainer.fit()"""),
    md("""## Generate one row per class

Pass the label vector to the solver; the UNet's class embedding steers each
trajectory to its digit."""),
    code("""key = jax.random.PRNGKey(1)
y = jnp.repeat(jnp.arange(10), 8)
imgs = trainer.generate(key, 80, method="euler", n_steps=50, y=y)
path = image_grid(imgs, nrow=8, save_path="results/nb_cond_mnist/samples.png")
print("saved", path)

from IPython.display import Image
Image(path)"""),
])


# ---------------------------------------------------------------------------
# 5. Minibatch-OT study: variance + straightness
# ---------------------------------------------------------------------------

OT_STUDY = nb([
    md("""# The (un)reasonable performance of minibatch OT

Counterpart of `The_unreasonable_performance_of_minibatch_OT.ipynb`: why
does re-pairing the minibatch by an OT plan help so much?

Two measurements: (1) the **variance of the regression target** — with
independent coupling, many different `u_t` values are seen at the same
`(t, x_t)`, so the MSE-optimal field averages crossing paths; OT coupling
collapses that variance; (2) the **straightness** of the learned flow
(`E ||v(t,x_t) - (x1-x0)||^2` along generated paths), which controls how
few inference steps you can get away with."""),
    code("""import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt

from cfm_tpu import (
    ConditionalFlowMatcher,
    ExactOptimalTransportConditionalFlowMatcher,
)
from cfm_tpu.coupling import OTPlanSampler
from cfm_tpu.data import eight_gaussians, sample_moons
from cfm_tpu.models import MLP
from cfm_tpu.train import init_train_state, make_optimizer, make_train_step
from cfm_tpu.variants import straightness"""),
    md("""## 1. Target variance at matched pairs

Sample many minibatches, record `(x_t, u_t)` at t=0.5, and compare the
spread of `u_t` for the nearest-neighbour `x_t` clusters under the two
couplings. A cheap proxy that needs no binning: the variance of `u_t`
itself — OT pairs nearby points, so `x1 - x0` concentrates."""),
    code("""key = jax.random.PRNGKey(0)
sampler = OTPlanSampler(method="exact")
u_ind, u_ot = [], []
for i in range(20):
    k0, k1, kp = jax.random.split(jax.random.fold_in(key, i), 3)
    x0 = eight_gaussians(k0, 256)
    x1 = sample_moons(k1, 256)
    u_ind.append(x1 - x0)                       # independent coupling
    x0p, x1p = sampler.sample_plan(kp, x0, x1)  # minibatch-OT coupling
    u_ot.append(x1p - x0p)
u_ind = jnp.concatenate(u_ind); u_ot = jnp.concatenate(u_ot)
print(f"Var[u_t] independent: {float(jnp.var(u_ind)):.3f}")
print(f"Var[u_t] minibatch OT: {float(jnp.var(u_ot)):.3f}")"""),
    md("""## 2. Straightness of the trained flows"""),
    code("""def train(matcher, steps=600):
    model = MLP(dim=2, w=64)
    k = jax.random.PRNGKey(1)
    params = model.init(k, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=2e-3, warmup_steps=0)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(matcher, model.apply, opt, ema_decay=0.99))
    for i in range(steps):
        k, k0, k1, ks = jax.random.split(k, 4)
        state, _ = step(state, ks, eight_gaussians(k0, 256), sample_moons(k1, 256))
    return model, state

results = {}
for name, matcher in [("I-CFM", ConditionalFlowMatcher(sigma=0.1)),
                      ("OT-CFM", ExactOptimalTransportConditionalFlowMatcher(sigma=0.1))]:
    model, state = train(matcher)
    k = jax.random.PRNGKey(2)
    s = float(straightness(model.apply, state.ema_params, k,
                           eight_gaussians(jax.random.fold_in(k, 1), 1024)))
    results[name] = s
    print(f"{name}: straightness (lower = straighter) {s:.4f}")

assert results["OT-CFM"] < results["I-CFM"]"""),
    md("""OT-CFM's paths are straighter, which is exactly why it tolerates
few-step Euler inference — the reference notebook reaches the same
conclusion with torch + POT on host; here the whole study (coupling
included) runs jitted on the accelerator."""),
])


# ---------------------------------------------------------------------------
# 6. Model comparison plotting
# ---------------------------------------------------------------------------

MODEL_COMPARISON = nb([
    md("""# Model comparison: all five matchers side by side

Counterpart of `model-comparison-plotting.ipynb`: train every matcher on
the same 8gaussians -> moons task and render the generated clouds and
sample paths in one figure (the reference renders a GIF; a static panel
carries the same information)."""),
    code("""import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt

from cfm_tpu import (
    ConditionalFlowMatcher,
    ExactOptimalTransportConditionalFlowMatcher,
    SchrodingerBridgeConditionalFlowMatcher,
    TargetConditionalFlowMatcher,
    VariancePreservingConditionalFlowMatcher,
)
from cfm_tpu.coupling import wasserstein
from cfm_tpu.data import eight_gaussians, sample_moons
from cfm_tpu.integrate import odeint, vector_field_from_model
from cfm_tpu.models import MLP
from cfm_tpu.train import init_train_state, make_optimizer, make_train_step

MATCHERS = {
    "I-CFM": (ConditionalFlowMatcher(sigma=0.1), eight_gaussians),
    "OT-CFM": (ExactOptimalTransportConditionalFlowMatcher(sigma=0.1), eight_gaussians),
    "SB-CFM": (SchrodingerBridgeConditionalFlowMatcher(sigma=0.5), eight_gaussians),
    "FM (Lipman)": (TargetConditionalFlowMatcher(sigma=0.1), None),  # Gaussian source
    "VP-CFM": (VariancePreservingConditionalFlowMatcher(sigma=0.0), eight_gaussians),
}"""),
    code("""def train(matcher, source_fn, steps=600, batch=256):
    model = MLP(dim=2, w=64)
    k = jax.random.PRNGKey(0)
    params = model.init(k, jnp.zeros((2,)), jnp.zeros((2, 2)))
    opt = make_optimizer(lr=2e-3, warmup_steps=0)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(matcher, model.apply, opt, ema_decay=0.99))
    for i in range(steps):
        k, k0, k1, ks = jax.random.split(k, 4)
        x0 = (source_fn(k0, batch) if source_fn
              else jax.random.normal(k0, (batch, 2)))
        state, _ = step(state, ks, x0, sample_moons(k1, batch))
    return model, state

trained = {}
for name, (matcher, src) in MATCHERS.items():
    print("training", name)
    trained[name] = (*train(matcher, src), src)"""),
    code("""n = 1024
key = jax.random.PRNGKey(7)
target = sample_moons(jax.random.fold_in(key, 9), n)
ts = jnp.linspace(0, 1, 101)

fig, axes = plt.subplots(1, len(trained), figsize=(4 * len(trained), 4))
for idx, (ax, (name, (model, state, src))) in enumerate(zip(axes, trained.items())):
    k = jax.random.fold_in(key, idx)
    x0 = src(k, n) if src else jax.random.normal(k, (n, 2))
    f = vector_field_from_model(model.apply, state.ema_params)
    sol = odeint(f, x0, ts, method="euler")
    traj = sol.ys
    ax.plot(traj[:, :96, 0], traj[:, :96, 1], c="olive", lw=0.2, alpha=0.5)
    ax.scatter(sol.final[:, 0], sol.final[:, 1], s=3, c="blue")
    w2 = float(wasserstein(sol.final, target, power=2))
    ax.set_title(f"{name}\\nW2={w2:.3f}")
plt.tight_layout()
plt.show()"""),
])


# ---------------------------------------------------------------------------
# 7. Unconditional MNIST
# ---------------------------------------------------------------------------

MNIST_UNCOND = nb([
    md("""# Unconditional MNIST with OT-CFM

Counterpart of `examples/images/mnist_example.ipynb`: train the small UNet
on MNIST with exact-minibatch-OT coupling (solved on device, inside the
jitted step) and sample a digit grid by Euler integration.

The default settings are a fast CPU-friendly smoke configuration on the
synthetic fallback set — flip `SYNTHETIC = False` with the MNIST idx files
under `data/` and raise `STEPS` (2000+) for real digits."""),
    code("""import jax
import jax.numpy as jnp

from cfm_tpu.config import load_config
from cfm_tpu.eval.plotting import image_grid
from cfm_tpu.trainer import Trainer

SYNTHETIC = True   # flip to False with real MNIST idx files under data/
STEPS = 30         # smoke default; use 2000+ for real digits

cfg = load_config("mnist_otcfm", [
    f"trainer.total_steps={STEPS}",
    "trainer.eval_interval=0",
    "data.batch_size=64",
    f"data.synthetic_fallback={SYNTHETIC}",
    "model.num_channels=16",
    "trainer.ckpt_dir=results/nb_mnist/checkpoints",
])
trainer = Trainer(cfg, log_dir="results/nb_mnist/logs")
trainer.fit()"""),
    md("""## Sample a grid

Integrate the learned field from Gaussian noise; `evaluate()` also reports
the weight-free tracking-FID against a held slice of the train set."""),
    code("""key = jax.random.PRNGKey(1)
imgs = trainer.generate(key, 64, method="euler", n_steps=50)
path = image_grid(imgs, nrow=8, save_path="results/nb_mnist/samples.png")
print("saved", path)
print("eval:", trainer.evaluate(n=256))

from IPython.display import Image
Image(path)"""),
])


# ---------------------------------------------------------------------------
# 8. Single-cell trajectory interpolation
# ---------------------------------------------------------------------------

SINGLE_CELL = nb([
    md("""# Single-cell trajectory interpolation with OT-CFM

Counterpart of the reference `examples/single_cell/single-cell_example.ipynb`:
interpolate a multi-timepoint population (scRNA embryoid-body style) with
OT-CFM, hold out an intermediate timepoint, and score the interpolation with
the distribution-distance suite.

This notebook runs the synthetic branching TREE population so it executes
anywhere; point `load_h5ad_timeseries` at a real `.h5ad` (obsm `X_pca` +
`day` labels) for real data — `examples/single_cell.py` is the CLI twin."""),
    code("""import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
from cfm_tpu.data.trajectory import (
    leaveout_adjusted_targets,
    make_joint_plan_sampler,
    resample_to_trajectory,
    sample_segment_pairs,
    tree_population,
)
from cfm_tpu.eval.metrics import compute_distribution_distances
from cfm_tpu.integrate import odeint
from cfm_tpu.models import MLP
from cfm_tpu.train import init_train_state, make_optimizer

T, LEAVEOUT = 5, 2
key = jax.random.PRNGKey(0)
X = np.asarray(tree_population(key, 1024, T=T, dim=2))
marginals = [X[:, t] for t in range(T)]

fig, axes = plt.subplots(1, T, figsize=(3 * T, 3), sharex=True, sharey=True)
for t, ax in enumerate(axes):
    ax.scatter(marginals[t][:, 0], marginals[t][:, 1], s=2)
    ax.set_title(f"t = {t}" + ("  (held out)" if t == LEAVEOUT else ""))
plt.tight_layout(); plt.show()"""),
    md("""## Train on adjacent-segment pairs

Per sample: draw a random adjacent timepoint pair (never *starting* at the
held-out timepoint; the pair before it straddles to t+2), OT-couple within
the segment, regress the segment-local velocity. The straddling segment's
target halves and its local time doubles (`leaveout_adjusted_targets`)."""),
    code("""import optax

matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.1)
model = MLP(dim=2, w=64)
params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 2)))
opt = make_optimizer(lr=1e-3, warmup_steps=0)
state = init_train_state(params, opt)

def loss_fn(params, key, Xb):
    k_seg, k_fm = jax.random.split(key)
    x0, x1, t_sel = sample_segment_pairs(
        k_seg, Xb, leaveout_timepoint=LEAVEOUT, training=True)
    t, xt, ut = matcher.sample_location_and_conditional_flow(k_fm, x0, x1)
    ut, t = leaveout_adjusted_targets(ut, t, t_sel, LEAVEOUT)
    vt = model.apply(params, t + t_sel, xt)   # net sees global time
    return jnp.mean(jnp.square(vt - ut))

@jax.jit
def step(state, key, Xb):
    loss, grads = jax.value_and_grad(loss_fn)(state.params, key, Xb)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    from cfm_tpu.utils import ema_update
    return state._replace(
        params=new_params,
        ema_params=ema_update(state.ema_params, new_params, 0.99),
        opt_state=opt_state, step=state.step + 1), loss

for i in range(400):
    key, kb, ks = jax.random.split(key, 3)
    Xb = resample_to_trajectory(kb, marginals, 256)
    state, loss = step(state, ks, Xb)
    if i % 100 == 0:
        print(f"step {i:4d}  loss {float(loss):.4f}")"""),
    md("""## Evaluate: roll through every timepoint

Integrate from t=0 marginal through all segments and score each predicted
marginal — including the held-out one the model never saw."""),
    code("""def f(t, x):
    return model.apply(state.ema_params, jnp.full((x.shape[0],), t, x.dtype), x)

x = jnp.asarray(marginals[0])
preds = []
for seg in range(T - 1):
    ts = jnp.linspace(float(seg), float(seg + 1), 51)
    x = odeint(f, x, ts, method="rk4", return_trajectory=False).final
    preds.append(x)
trues = [jnp.asarray(m) for m in marginals[1:]]
names, vals = compute_distribution_distances(preds, trues)
for n, v in zip(names, vals):
    if "Wasserstein" in n:
        print(f"  {n}: {v:.4f}")

fig, ax = plt.subplots(figsize=(4, 4))
ax.scatter(marginals[LEAVEOUT][:, 0], marginals[LEAVEOUT][:, 1],
           s=3, c="grey", alpha=0.5, label="held-out truth")
p = np.asarray(preds[LEAVEOUT - 1])
ax.scatter(p[:, 0], p[:, 1], s=3, c="blue", alpha=0.5, label="interpolated")
ax.legend(); ax.set_title(f"held-out timepoint t={LEAVEOUT}")
plt.show()"""),
    md("""## Geodesic variant: precomputed joint plans

The reference's geodesic datamodule trains from plans computed once up
front (`adata.uns["pi_{t}_{t+1}"]`) instead of re-solving OT per batch.
`make_joint_plan_sampler` consumes them jit-natively (inverse-CDF pair
draws). Here the plans are solved once from the synthetic marginals."""),
    code("""from cfm_tpu.coupling import OTPlanSampler

solver = OTPlanSampler(method="exact")
plans = [np.asarray(solver.get_map(jnp.asarray(marginals[t]),
                                   jnp.asarray(marginals[t + 1])))
         for t in range(T - 1)]
plan_sample = make_joint_plan_sampler(marginals, plans)
x0p, x1p, t_sel = plan_sample(jax.random.PRNGKey(3), 512)
d_plan = float(jnp.mean(jnp.sum((x0p - x1p) ** 2, axis=1)))
print("mean squared pair distance under the precomputed plans:", round(d_plan, 4))"""),
])


# ---------------------------------------------------------------------------
# 9. Tabular Forest-Flow
# ---------------------------------------------------------------------------

TABULAR = nb([
    md("""# Forest-Flow: flow matching with gradient-boosted trees

Counterpart of the reference `examples/tabular/*.ipynb` (Forest-Flow,
Jolicoeur-Martineau et al.): learn the I-CFM conditional vector field
`u_t = x1 - x0` at discretized time levels with a **tree ensemble** instead
of a neural net, then generate by Euler integration over the per-level
regressors.

The reference uses XGBoost; this environment ships scikit-learn, whose
`HistGradientBoostingRegressor` is the same histogram-GBDT family. The
framework's role is the CFM path construction (`sample_xt`) and the
evaluation metrics — the trees themselves are host-side by nature."""),
    code("""import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
from sklearn.datasets import load_iris
from sklearn.ensemble import HistGradientBoostingRegressor

from cfm_tpu import ConditionalFlowMatcher
from cfm_tpu.coupling import wasserstein

N_T, DUP = 8, 10        # time levels / noise duplications (Forest-Flow K)
rng = np.random.default_rng(0)
X = load_iris().data.astype(np.float32)
mu, sd = X.mean(0), X.std(0) + 1e-8
X = (X - mu) / sd
n, d = X.shape
print(f"iris: {n} rows, {d} dims")"""),
    md("""## Fit one GBDT per (time level, output dim)

For each level `t_k`, pair every data point with `DUP` noise draws, build
`x_t` with the matcher's path (`sample_xt`), and regress `u = x1 - x0`."""),
    code("""FM = ConditionalFlowMatcher(sigma=0.0)
t_levels = np.linspace(0.0, 1.0, N_T, endpoint=False)
x1 = np.repeat(X, DUP, axis=0)
x0 = rng.standard_normal(x1.shape).astype(np.float32)

models = []
for k, t in enumerate(t_levels):
    tb = jnp.full((x1.shape[0],), float(t))
    xt = np.asarray(FM.sample_xt(jnp.asarray(x0), jnp.asarray(x1), tb,
                                 jnp.zeros_like(jnp.asarray(x0))))
    ut = x1 - x0
    models.append([
        HistGradientBoostingRegressor(max_iter=50, random_state=0).fit(xt, ut[:, j])
        for j in range(d)
    ])
print("fitted", N_T, "levels x", d, "dims")"""),
    md("""## Generate and evaluate

Euler over the piecewise-constant-in-time forest field, then compare the
synthetic marginals to the real ones."""),
    code("""m, steps = 500, 60
x = rng.standard_normal((m, d)).astype(np.float32)
dt = 1.0 / steps
for s in range(steps):
    t = s * dt
    k = min(int(t * N_T), N_T - 1)
    u = np.stack([models[k][j].predict(x) for j in range(d)], axis=1)
    x = x + dt * u.astype(np.float32)

w2 = float(wasserstein(jnp.asarray(x), jnp.asarray(X), power=2))
print(f"generated-vs-real W2: {w2:.4f}")

fig, axes = plt.subplots(1, d, figsize=(3 * d, 3))
for j, ax in enumerate(axes):
    ax.hist(X[:, j], bins=20, alpha=0.5, density=True, label="real")
    ax.hist(x[:, j], bins=20, alpha=0.5, density=True, label="forest-flow")
    ax.set_title(load_iris().feature_names[j], fontsize=8)
axes[0].legend(fontsize=7)
plt.tight_layout(); plt.show()"""),
])


NOTEBOOKS = {
    "flow_matching_tutorial.ipynb": FLOW_MATCHING,
    "SF2M_tutorial.ipynb": SF2M,
    "maximum_likelihood_CNF_tutorial.ipynb": CNF,
    "conditional_mnist.ipynb": COND_MNIST,
    "mnist_example.ipynb": MNIST_UNCOND,
    "minibatch_OT_study.ipynb": OT_STUDY,
    "model_comparison_plotting.ipynb": MODEL_COMPARISON,
    "single_cell_example.ipynb": SINGLE_CELL,
    "tabular_forest_flow.ipynb": TABULAR,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    for name, notebook in NOTEBOOKS.items():
        if args.only and args.only not in name:
            continue
        path = os.path.join(OUT, name)
        if args.execute:
            from nbclient import NotebookClient

            client = NotebookClient(notebook, timeout=1800)
            client.execute()
        nbf.write(notebook, path)
        print("wrote", path)


if __name__ == "__main__":
    main()
