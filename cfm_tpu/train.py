"""Training: jitted CFM train step, optimizer recipe, EMA, data-parallel mesh.

TPU-native counterpart of the reference training loops
(/root/reference/examples/images/cifar10/train_cifar10.py:54-170 and
train_cifar10_ddp.py:62-215). The entire step — minibatch OT coupling, path
sampling, UNet fwd/bwd, gradient all-reduce, Adam + warmup + clip, EMA — is
ONE compiled XLA program. Data parallelism is a ``jax.sharding`` NamedSharding
over a ("data",) mesh: the psum over ICI replaces DDP's NCCL ring all-reduce
(utils_cifar.py:15-39), and sharded batches replace DistributedSampler.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .utils import ema_update

Array = jax.Array


def warmup_lr_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """Linear warmup then constant — the reference's ``warmup_lr`` lambda
    (train_cifar10.py:58-59: min(step, warmup) / warmup), DELIBERATELY
    shifted by one: ``min(step+1, warmup)/warmup``. optax schedules see the
    pre-increment count (step 0 on the first update), and a 0-lr first step
    would be a wasted batch; full lr is reached at update ``warmup-1``,
    matching the reference's lr sequence from its step 1 onward."""

    def schedule(step):
        if warmup_steps <= 0:
            return base_lr
        return base_lr * jnp.minimum(step + 1.0, float(warmup_steps)) / float(warmup_steps)

    return schedule


def make_optimizer(
    lr: float = 2e-4,
    warmup_steps: int = 5000,
    grad_clip: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam + linear warmup + global-norm clip — the CIFAR-10 recipe
    (train_cifar10.py:100-104, 146-151)."""
    tx = [optax.clip_by_global_norm(grad_clip)] if grad_clip else []
    if weight_decay:
        tx.append(optax.adamw(warmup_lr_schedule(lr, warmup_steps), b1=b1, b2=b2,
                              weight_decay=weight_decay))
    else:
        tx.append(optax.adam(warmup_lr_schedule(lr, warmup_steps), b1=b1, b2=b2))
    return optax.chain(*tx)


class TrainState(NamedTuple):
    """Everything checkpointed: {params, ema_params, opt_state, step} — the
    same payload as the reference's torch.save dict (train_cifar10.py:157-166)."""

    params: Any
    ema_params: Any
    opt_state: Any
    step: Array


def init_train_state(params: Any, optimizer: optax.GradientTransformation) -> TrainState:
    # ema starts as a COPY: params and ema_params must not alias, or buffer
    # donation of the state would donate the same buffer twice.
    return TrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    matcher,
    apply_fn: Callable[..., Array],
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.9999,
    class_conditional: bool = False,
    score_apply_fn: Optional[Callable[..., Array]] = None,
    data_axis: Optional[str] = None,
    train_mode: bool = False,
) -> Callable:
    """Build the jittable CFM train step.

    step(state, key, x0, x1[, y0, y1]) -> (state, metrics)

    - ``matcher``: any of the five flow matchers (cfm_tpu.paths); its
      coupling (incl. exact OT) traces into the step.
    - ``apply_fn(params, t, xt[, y])``: the vector-field model.
    - ``score_apply_fn``: optional score head — adds the [SF]2M score loss
      mean((lambda_t * s + eps)^2) (reference SF2M_tutorial.ipynb,
      SURVEY.md section 3.5); ``state.params`` must then be a dict
      {"flow": ..., "score": ...}.
    - ``data_axis``: name of the mesh axis when called under shard_map; under
      plain jit + NamedSharding, XLA inserts the gradient all-reduce itself
      and this should stay None.
    - ``train_mode``: pass ``train=True`` + a dropout PRNG to the model
      (required for nets with dropout, e.g. the CIFAR-10 UNet recipe's 0.1 —
      reference train_cifar10.py:97).
    """

    use_score = score_apply_fn is not None

    def fast_dropout_key(k):
        """Re-wrap a raw threefry key as an "rbg" typed key for dropout.

        Dropout masks don't need threefry's counter math — generating them
        with it costs real VPU time at bs128 (every mask is a full
        activation-sized tensor of random bits). The "rbg" impl lowers to
        the XLA RngBitGenerator (the TPU's hardware RNG path), making mask
        generation near-free; fold_in/split on rbg keys remain
        threefry-derived so per-layer streams stay well-separated. The
        reference recipe's dropout (train_cifar10.py:98) needs no
        cross-step mask reproducibility beyond seeding, which this keeps.
        """
        if jnp.issubdtype(k.dtype, jax.dtypes.prng_key):
            return k  # caller already chose an impl
        return jax.random.wrap_key_data(
            jnp.concatenate([k, k]), impl="rbg"
        )

    def call_model(fn, p, t, xt, cond, drop_key):
        args = (p, t, xt) + ((cond,) if cond is not None else ())
        if train_mode:
            return fn(*args, train=True,
                      rngs={"dropout": fast_dropout_key(drop_key)})
        return fn(*args)

    def loss_fn(params, key, x0, x1, y0, y1):
        key, drop_key, score_drop_key = jax.random.split(key, 3)
        if class_conditional:
            t, xt, ut, y0_, y1_, eps, coupling_bad = (
                matcher.guided_sample_location_and_conditional_flow(
                    key, x0, x1, y0=y0, y1=y1, return_noise=True,
                    return_coupling_status=True,
                )
            )
            cond = y1_
        else:
            t, xt, ut, eps, coupling_bad = (
                matcher.sample_location_and_conditional_flow(
                    key, x0, x1, return_noise=True, return_coupling_status=True
                )
            )
            cond = None
        flow_params = params["flow"] if use_score else params
        vt = call_model(apply_fn, flow_params, t, xt, cond, drop_key)
        flow_loss = jnp.mean(jnp.square(vt - ut))
        # coupling_degenerate surfaces the in-jit uniform-coupling fallback
        # (reference optimal_transport.py:88-97 prints eagerly; a compiled
        # step can't). Float so pmean gives the degenerate-shard fraction.
        metrics = {"loss": flow_loss, "flow_loss": flow_loss,
                   "coupling_degenerate": coupling_bad.astype(jnp.float32)}
        if use_score:
            lambda_t = matcher.compute_lambda(t)
            st = call_model(score_apply_fn, params["score"], t, xt, cond, score_drop_key)
            lam = lambda_t.reshape(-1, *([1] * (st.ndim - 1)))
            score_loss = jnp.mean(jnp.square(lam * st + eps))
            metrics["score_loss"] = score_loss
            metrics["loss"] = flow_loss + score_loss
        return metrics["loss"], metrics

    def train_step(state: TrainState, key: Array, x0: Array, x1: Array,
                   y0: Optional[Array] = None, y1: Optional[Array] = None):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, x0, x1, y0, y1
        )
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
            metrics = jax.lax.pmean(metrics, data_axis)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, ema_decay)
        new_state = TrainState(params, ema_params, opt_state, state.step + 1)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    # Tag for shard_map wrappers (parallel.mesh.local_coupling_step) to
    # verify the gradient pmean is actually inside the step they shard.
    train_step._data_axis = data_axis
    return train_step


# --------------------------------------------------------------------------
# Data-parallel sharding helpers
# --------------------------------------------------------------------------


def make_data_parallel_step(
    train_step: Callable, mesh: jax.sharding.Mesh, data_axis: str = "data"
) -> Callable:
    """jit the train step with batch inputs sharded over the data axis.

    The returned function has the same signature; parameters/opt state are
    replicated, batches are split on axis 0 across devices, and XLA inserts
    the gradient psum over ICI — the reference's DDP all-reduce
    (train_cifar10_ddp.py:124-125), compiler-scheduled.
    """
    replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    batch_sharded = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(data_axis)
    )

    def shard_batch(x):
        return jax.device_put(x, batch_sharded) if x is not None else None

    jitted = jax.jit(
        train_step,
        in_shardings=(replicated, replicated, batch_sharded, batch_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )

    def step(state, key, x0, x1):
        return jitted(state, key, shard_batch(x0), shard_batch(x1))

    return step


def make_replicated_coupling_shard_fn(
    matcher,
    apply_fn: Callable[..., Array],
    optimizer: optax.GradientTransformation,
    mesh: jax.sharding.Mesh,
    data_axis="data",
    **step_kwargs,
) -> Callable:
    """The manual-mode per-device body behind
    :func:`make_data_parallel_train_step`: must be called INSIDE a
    ``shard_map`` over ``data_axis`` with replicated (full-batch) inputs.
    Couples the identical global batch on every device, slices the local
    rows, folds the device index into the path-noise key, and runs the
    uncoupled inner step (which pmeans grads/metrics over ``data_axis``).
    Exposed so harness-level fused steps (Trainer) can compose data prep +
    this body inside ONE shard_map — see make_data_parallel_train_step's
    docstring for why manual mode (Pallas/GSPMD) is required.
    """
    coupled = hasattr(matcher, "ot_sampler")
    inner_matcher = matcher.without_coupling() if coupled else matcher
    inner = make_train_step(inner_matcher, apply_fn, optimizer,
                            data_axis=data_axis, **step_kwargs)
    # data_axis may be a tuple for 2-level (DCN x ICI) meshes: the shard
    # index is the row-major linear index across the named axes.
    axes = (data_axis,) if isinstance(data_axis, str) else tuple(data_axis)
    n_dev = 1
    for a in axes:
        n_dev *= mesh.shape[a]

    def shard_fn(state, key, x0, x1, y0=None, y1=None):
        idx = jnp.zeros((), jnp.int32)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        coupling_bad = None
        if coupled:
            kc, key = jax.random.split(key)
            if y0 is not None or y1 is not None:
                x0, x1, y0, y1, coupling_bad = (
                    matcher.ot_sampler.sample_plan_with_labels(
                        kc, x0, x1, y0, y1, return_status=True
                    )
                )
            else:
                x0, x1, coupling_bad = matcher.ot_sampler.sample_plan(
                    kc, x0, x1, return_status=True
                )
        # Static-shape guard (trace-time): a non-divisible batch would
        # silently drop the remainder rows from every step (and batch <
        # n_dev would mean zero-size shards -> NaN means).
        assert x0.shape[0] % n_dev == 0, (
            f"global batch {x0.shape[0]} must divide over {n_dev} devices"
        )
        shard = x0.shape[0] // n_dev

        def sl(a):
            return (None if a is None
                    else jax.lax.dynamic_slice_in_dim(a, idx * shard, shard, 0))

        key = jax.random.fold_in(key, idx)  # per-shard path-noise stream
        state, metrics = inner(state, key, sl(x0), sl(x1), sl(y0), sl(y1))
        if coupling_bad is not None:
            # Overwrite the inner (uncoupled) matcher's always-False flag
            # with the real global-coupling status.
            metrics["coupling_degenerate"] = coupling_bad.astype(jnp.float32)
        return state, metrics

    return shard_fn


def make_data_parallel_train_step(
    matcher,
    apply_fn: Callable[..., Array],
    optimizer: optax.GradientTransformation,
    mesh: jax.sharding.Mesh,
    data_axis: str = "data",
    **step_kwargs,
) -> Callable:
    """Data-parallel train step with REPLICATED global OT coupling.

    The (B, B) coupling solve (auction/annealed-Sinkhorn while_loops with
    scalar global reductions) does not partition cleanly: under plain
    jit+NamedSharding, GSPMD resolves its mixed shardings by gathering the
    whole subcomputation onto one device ("Involuntary full
    rematerialization ... to {maximal device=0}"), serializing every chip
    behind device 0. Here the coupling runs REPLICATED — each chip runs the
    identical small solve (~0.3 ms at B=128 vs ~45 ms UNet fwd/bwd, so <1%
    redundant compute) — and the model fwd/bwd runs on each chip's slice of
    the coupled batch. The plan solve sees the GLOBAL batch, keeping the
    reference single-process semantics (train_cifar10.py), unlike the
    per-shard local-coupling mode (parallel.mesh.local_coupling_step) which
    mirrors DDP's per-rank plans (train_cifar10_ddp.py).

    The whole step executes inside ONE ``shard_map`` (manual mesh axes,
    round 4): Mosaic/Pallas custom calls (the auction coupling, the fused
    attention block) have no GSPMD partitioning rule, so under plain
    jit+NamedSharding the SPMD partitioner would have to replicate or
    gather around them; in manual mode every kernel sees concrete
    per-device shapes and lowers exactly as on one chip. Each shard couples
    the identical global batch with the shared key, slices its own rows,
    folds the device index into the path-noise key (the reference DDP's
    per-rank generator, train_cifar10_ddp.py:118), and grads/metrics are
    pmean'd by the inner step.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec

    P = PartitionSpec
    replicated = NamedSharding(mesh, P())
    shard_fn = make_replicated_coupling_shard_fn(
        matcher, apply_fn, optimizer, mesh, data_axis, **step_kwargs
    )

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        # Inputs arrive replicated: every device holds the full batch (at the
        # recipe's B=128 images that is 1.5 MB — noise next to the model) and
        # solves the identical coupling, so no gather precedes the solve.
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded, donate_argnums=(0,))

    def step(state, key, x0, x1):
        x0 = jax.device_put(x0, replicated)
        x1 = jax.device_put(x1, replicated)
        return jitted(state, key, x0, x1)

    return step


def make_data_parallel_sample_fn(
    apply_fn: Callable[..., Array],
    mesh: jax.sharding.Mesh,
    n: int,
    x_shape: Tuple[int, ...],
    method: str = "euler",
    n_steps: int = 100,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    data_axis="data",
) -> Callable:
    """Batch-sharded ODE sampling over a mesh — the inference analogue of
    ``make_data_parallel_step`` (reference role: per-rank generate_samples
    under DDP, utils_cifar.py:42-73, and the multi-GPU half of the 50k FID
    protocol, compute_fid.py:67-91).

    Params are replicated; the integration runs per device on its slice of
    the batch INSIDE ``shard_map`` (manual mesh axes, round 4 — the Pallas
    attention kernels have no GSPMD partitioning rule, so auto-sharded jit
    cannot partition them on real multi-chip hardware). Embarrassingly
    parallel: zero collectives, so sampling throughput scales linearly with
    chips by construction. The noise draw is the GLOBAL (n, ...) tensor
    computed identically on every device and then sliced, which keeps the
    output sample-for-sample equal to the single-device program (validated
    in tests/test_train_e2e.py) — the redundant draw is a few MB of RNG.

    Returns ``sample(params, key) -> (n, *x_shape)`` final samples.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec

    from .integrate import odeint, vector_field_from_model

    P = PartitionSpec
    replicated = NamedSharding(mesh, P())
    n_dev = mesh.shape[data_axis]
    assert n % n_dev == 0, f"n={n} must divide over {n_dev} devices"
    # Adaptive methods get the 2-point span (they pick their own steps; a
    # dense grid would force a step-clamp restart at every point for tsit5).
    ts = (jnp.array([0.0, 1.0]) if method in ("dopri5", "tsit5")
          else jnp.linspace(0.0, 1.0, n_steps + 1))

    def shard_fn(params, key):
        idx = jax.lax.axis_index(data_axis)
        shard = n // n_dev
        x0 = jax.random.normal(key, (n,) + tuple(x_shape))
        x0 = jax.lax.dynamic_slice_in_dim(x0, idx * shard, shard, 0)
        f = vector_field_from_model(apply_fn, params)
        sol = odeint(f, x0, ts, method=method, rtol=rtol, atol=atol,
                     return_trajectory=False)
        return sol.final

    sharded_fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(data_axis),
        check_vma=False,
    )
    return jax.jit(sharded_fn, in_shardings=(replicated, replicated))


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> jax.sharding.Mesh:
    """1-D device mesh — delegates to the one canonical implementation
    (parallel.mesh.make_mesh) so device-ordering fixes apply everywhere."""
    from .parallel.mesh import make_mesh as _mm

    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return _mm(axis_names=(axis,), devices=devs)
