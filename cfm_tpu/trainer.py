"""Experiment harness: config -> model/matcher/data -> train/eval loop.

The thin-consumer counterpart of the reference's Lightning harness
(/root/reference/runner/src/train.py:49-141 and the v2 module
runner/src/models/runner.py:16-173): the harness only wires config-selected
pieces of the library together — the matcher/coupling/solver stay library
code, exactly the separation the reference's own v1->v2 migration was moving
toward (SURVEY.md section 7 design stance).

Features: seeding, data-parallel mesh, train loop with metric logging (CSV +
stdout), periodic eval (2-moons distances / image grids), orbax
checkpoint/resume of {params, ema, opt_state, step}.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import CheckpointManager
from .config import Config
from .coupling import wasserstein
from .data import two_dim_data
from .data.images import infinite_batches, load_cifar10, load_mnist, normalize_images, random_hflip
from .integrate import FlowSolver, odeint, vector_field_from_model
from .models import MLP, UNetModelWrapper
from .paths import (
    ConditionalFlowMatcher,
    ExactOptimalTransportConditionalFlowMatcher,
    SchrodingerBridgeConditionalFlowMatcher,
    TargetConditionalFlowMatcher,
    VariancePreservingConditionalFlowMatcher,
)
from .train import (
    TrainState,
    init_train_state,
    make_data_parallel_step,
    make_mesh,
    make_optimizer,
    make_train_step,
)

Array = jax.Array


def build_matcher(cfg: Config):
    kind, sigma = cfg.matcher.kind, cfg.matcher.sigma
    if kind == "icfm":
        return ConditionalFlowMatcher(sigma=sigma)
    if kind == "otcfm":
        return ExactOptimalTransportConditionalFlowMatcher(sigma=sigma)
    if kind == "fm":
        return TargetConditionalFlowMatcher(sigma=sigma)
    if kind == "sbcfm":
        return SchrodingerBridgeConditionalFlowMatcher(
            sigma=sigma if sigma > 0 else 1.0, ot_method=cfg.matcher.ot_method
        )
    if kind == "vpcfm":
        return VariancePreservingConditionalFlowMatcher(sigma=sigma)
    raise ValueError(f"Unknown matcher kind: {kind}")


def build_model(cfg: Config):
    m = cfg.model
    if m.kind == "mlp":
        if cfg.data.dataset in _2D_SETS:
            dim = _vector_dim(cfg) or 2
        else:
            dim = int(np.prod(m.image_dim))
        return MLP(dim=dim, w=m.width)
    if m.kind == "unet":
        return UNetModelWrapper(
            dim=m.image_dim,
            num_channels=m.num_channels,
            num_res_blocks=m.num_res_blocks,
            channel_mult=m.channel_mult,
            num_heads=m.num_heads,
            num_head_channels=m.num_head_channels,
            attention_resolutions=m.attention_resolutions,
            dropout=m.dropout,
            use_scale_shift_norm=m.use_scale_shift_norm,
            resblock_updown=m.resblock_updown,
            class_cond=m.class_cond,
            num_classes=m.num_classes,
            use_checkpoint=m.use_checkpoint,
            checkpoint_policy=m.checkpoint_policy,
            dtype=jnp.bfloat16 if m.bf16 else jnp.float32,
        )
    raise ValueError(f"Unknown model kind: {m.kind}")



def _vector_dim(cfg) -> int:
    """Effective sample dim for the vector (non-image) path: data.dim if set,
    else funnel's reference default 10 (configs/datamodule/funnel.yaml), else
    0 (generator default, 2-D). Applied to BOTH target and source generators
    so a funnel target always gets a matching-dim gaussian source."""
    if cfg.data.dim:
        return cfg.data.dim
    return 10 if cfg.data.dataset == "funnel" else 0


def _source_gen(cfg):
    """Resolve the source generator at the effective vector dim.

    When the target needs dim > 2 (funnel) but the configured source is a
    2-D-only generator (every 2d_* preset defaults to '8gaussians'), fall
    back to the standard-normal base — the reference's funnel runs use the
    CNF's N(0, I) base distribution, there is no d-dim 8gaussians to match.
    An explicitly dim-aware source (gaussian/funnel) is used as configured.
    """
    from .data.toy import _DIM_AWARE

    dim = _vector_dim(cfg)
    name = cfg.data.source
    if dim > 2 and name not in _DIM_AWARE:
        return two_dim_data("gaussian", dim)
    return two_dim_data(name, dim)

_2D_SETS = {"moons", "moon", "8gaussians", "pinwheel", "checkerboard", "checker",
            "circles", "circle", "2spirals", "swiss", "swissroll", "scurve",
            "mixture", "gaussian", "funnel"}


def _overfit_key(seed: int, salt: int, step, n_batches: int):
    """Deterministic data-draw key that cycles with period ``n_batches``.

    Implements trainer.overfit_batches (the reference's debug/overfit.yaml ->
    Lightning ``overfit_batches: 3``): step k re-draws the data of batch
    ``k % n``, so the run sees a fixed pool of n batches. Only DATA keys are
    cycled — noise/t/dropout keys stay fresh, matching Lightning's
    dataloader-level reuse (augment transforms there also re-run per epoch).
    ``step`` may be a traced int32 (it is ``state.step`` inside the jitted
    fused step).
    """
    base = jax.random.fold_in(jax.random.PRNGKey(seed), salt)
    return jax.random.fold_in(base, step % n_batches)


class MetricLogger:
    """CSV + JSONL + stdout metric logging.

    Covers the reference's logger-backend roles (runner/configs/logger/*.yaml:
    csv always; wandb attaches when the package is installed and
    CFM_TPU_WANDB=1; tensorboard event files when CFM_TPU_TB=1 via the
    dependency-free writer in ``cfm_tpu.tb_events`` — all optional, zero hard
    dependency)."""

    def __init__(self, log_dir: str, name: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.path = os.path.join(log_dir, f"{name}_metrics.csv")
        self.jsonl_path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._writer = None
        self._file = None
        self._wandb = None
        self._tb = None
        if os.environ.get("CFM_TPU_TB") == "1":
            from .tb_events import TBEventWriter

            self._tb = TBEventWriter(os.path.join(log_dir, "tensorboard", name))
        if os.environ.get("CFM_TPU_WANDB") == "1":
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="cfm_tpu", name=name, dir=log_dir)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        import json

        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        if self._writer is None:
            self._file = open(self.path, "a", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=list(row))
            if self._file.tell() == 0:
                self._writer.writeheader()
        try:
            self._writer.writerow(row)
        except ValueError:  # new metric keys (e.g. eval rows): fall back to jsonl only
            pass
        self._file.flush()
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(row, step=step)
        if self._tb is not None:
            for k, v in row.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)
            self._tb.flush()

    def close(self):
        if self._file:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()


class Trainer:
    """Config-driven training: the L5 entry point of the framework."""

    def __init__(self, cfg: Config, log_dir: str = "logs"):
        from .compile_cache import enable as _enable_compile_cache

        _enable_compile_cache()
        self.cfg = cfg
        self.is_image = cfg.data.dataset in ("cifar10", "mnist")
        self.matcher = build_matcher(cfg)
        self.model = build_model(cfg)
        self.logger = MetricLogger(log_dir, cfg.name)
        self.key = jax.random.PRNGKey(cfg.trainer.seed)

        # Params.
        self.key, init_key = jax.random.split(self.key)
        if self.is_image:
            h, w, c = cfg.model.image_dim
            dummy_x = jnp.zeros((2, h, w, c))
        else:
            dummy_x = jnp.zeros((2, _vector_dim(cfg) or 2))
        dummy_t = jnp.zeros((2,))
        if cfg.model.class_cond:
            params = self.model.init(init_key, dummy_t, dummy_x, jnp.zeros((2,), jnp.int32))
        else:
            params = self.model.init(init_key, dummy_t, dummy_x)
        self.score_model = None
        if cfg.matcher.score_head:
            self.score_model = build_model(cfg)
            score_params = self.score_model.init(
                jax.random.fold_in(init_key, 1), dummy_t, dummy_x
            )
            params = {"flow": params, "score": score_params}

        # Optimizer + step.
        self.optimizer = make_optimizer(
            lr=cfg.optim.lr,
            warmup_steps=cfg.optim.warmup_steps,
            grad_clip=cfg.optim.grad_clip,
            weight_decay=cfg.optim.weight_decay,
        )
        self.state = init_train_state(params, self.optimizer)
        step_fn = make_train_step(
            self.matcher,
            self.model.apply,
            self.optimizer,
            ema_decay=cfg.optim.ema_decay,
            class_conditional=cfg.model.class_cond,
            score_apply_fn=self.score_model.apply if self.score_model else None,
            # Dropout only exists in the UNet; MLPs don't take train/rngs.
            train_mode=cfg.model.kind == "unet" and cfg.model.dropout > 0,
        )
        self._raw_step = step_fn
        if cfg.trainer.data_parallel and len(jax.devices()) > 1:
            self.mesh = make_mesh()
            # Replicated-coupling dp step: the global (B, B) OT solve is
            # pinned replicated (GSPMD otherwise serializes it onto one
            # device); model fwd/bwd is batch-sharded.
            from .train import make_data_parallel_train_step

            self.step_fn = make_data_parallel_train_step(
                self.matcher,
                self.model.apply,
                self.optimizer,
                self.mesh,
                ema_decay=cfg.optim.ema_decay,
                class_conditional=cfg.model.class_cond,
                score_apply_fn=self.score_model.apply if self.score_model else None,
                train_mode=cfg.model.kind == "unet" and cfg.model.dropout > 0,
            )
        else:
            self.mesh = None
            self.step_fn = jax.jit(step_fn, donate_argnums=(0,))

        # Checkpointing.
        self.ckpt = CheckpointManager(
            os.path.join(cfg.trainer.ckpt_dir, cfg.name),
            save_interval=cfg.trainer.ckpt_interval,
        )
        if cfg.trainer.resume and self.ckpt.latest_step() is not None:
            try:
                self.state = self.ckpt.restore(self.state)
            except ValueError as e:
                # Orbax raises on tree-structure mismatch — almost always a
                # checkpoint written by an older model definition. Refuse
                # loudly rather than training silently from scratch over it.
                raise ValueError(
                    f"Checkpoint under {cfg.trainer.ckpt_dir}/{cfg.name} does "
                    "not match the current model's parameter tree (it likely "
                    "predates a model change). Delete the stale directory or "
                    "point trainer.ckpt_dir elsewhere to start fresh."
                ) from e
            print(f"resumed from step {int(self.state.step)}")

        # Model summary (reference ModelSummary callback + the params rows of
        # log_hyperparameters, runner/src/utils/utils.py:149-155): param
        # count printed at startup and persisted next to the metrics.
        self.n_params = sum(
            int(np.prod(l.shape)) for l in jax.tree.leaves(self.state.params)
        )
        print(f"model: {cfg.model.kind}  params: {self.n_params:,}")
        if os.environ.get("CFM_TPU_MODEL_SUMMARY") == "1":
            # Per-module breakdown (RichModelSummary role, callbacks/
            # model_summary.yaml); opt-in to keep default startup quiet.
            from .utils import param_summary

            print(param_summary(self.state.params, max_depth=2))
        with open(os.path.join(self.logger.log_dir, f"{cfg.name}_hparams.json"), "w") as f:
            import dataclasses as _dc
            import json as _json

            _json.dump(
                {"model/params/total": self.n_params, "config": _dc.asdict(cfg)},
                f, indent=1, default=str,
            )

        self._batches = self._make_batch_source()

    # -- data -------------------------------------------------------------
    #
    # Perf-critical on the axon tunnel (~30 ms dispatch RTT): everything that
    # can run on device runs INSIDE one fused jitted step — 2D batches are
    # generated from the PRNG key in-step (zero host data), image batches
    # ship as raw uint8 (4x smaller) and are normalized/flipped/noise-paired
    # in-step; the host loop prefetches the next uint8 batch with an async
    # device_put while the current step runs.

    def _make_batch_source(self) -> Callable[[Array], Tuple[Array, Array, Optional[Array]]]:
        cfg = self.cfg
        bs = cfg.data.batch_size
        if not self.is_image:
            return None  # 2D data is generated inside the fused step

        loader = load_cifar10 if cfg.data.dataset == "cifar10" else load_mnist
        try:
            data, labels = loader(cfg.data.data_dir, train=True)
        except FileNotFoundError:
            if not cfg.data.synthetic_fallback:
                raise
            data, labels = loader(cfg.data.data_dir, train=True, synthetic=True)
            print(f"WARNING: {cfg.data.dataset} not found on disk; using synthetic data")
        # Fixed uint8 slice for the tracking-FID quality curve (evaluate()).
        self._ref_images_u8 = np.asarray(data[:4096])
        if cfg.data.on_device:
            # Whole dataset to HBM once; batches gathered in-step.
            self._device_data = jax.device_put(jnp.asarray(data))
            self._device_labels = (
                jax.device_put(jnp.asarray(labels)) if cfg.model.class_cond else None
            )
            return None
        it = infinite_batches(data, labels, bs, seed=cfg.trainer.seed)
        if cfg.trainer.overfit_batches:
            # Host-streaming analogue of the overfit cycle: replay the first
            # N batches forever (Lightning overfit_batches semantics).
            import itertools

            pool = [next(it) for _ in range(cfg.trainer.overfit_batches)]
            return itertools.cycle(pool)
        return it

    def _make_fused_step(self):
        """Wrap the raw step so data prep traces into the same XLA program.

        Data-parallel (self.mesh set): the whole fused step — replicated
        in-step data prep + the replicated-coupling/per-shard-model core —
        runs inside ONE ``shard_map`` (manual mesh axes). Pallas custom
        calls (auction coupling, fused attention block) have no GSPMD
        partitioning rule, so a plain jit+NamedSharding program would have
        to replicate or gather around them; in manual mode every kernel
        sees concrete per-device shapes (see train.make_data_parallel_
        train_step). Prep is keyed identically on every device, so the
        global batch is bitwise-identical across shards before slicing.
        """
        cfg = self.cfg
        bs = cfg.data.batch_size
        base_step = self._raw_step

        if self.mesh is not None:
            from cfm_tpu.train import make_replicated_coupling_shard_fn

            core = make_replicated_coupling_shard_fn(
                self.matcher, self.model.apply, self.optimizer, self.mesh,
                ema_decay=cfg.optim.ema_decay,
                class_conditional=cfg.model.class_cond,
                score_apply_fn=self.score_model.apply if self.score_model else None,
                train_mode=cfg.model.kind == "unet" and cfg.model.dropout > 0,
            )
        else:
            core = None

        def _finalize(fn, n_data):
            if core is None:
                return jax.jit(fn, donate_argnums=(0,))
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            sm = shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(), P()) + (P(),) * n_data,
                out_specs=(P(), P()),
                check_vma=False,
            )
            return jax.jit(sm, donate_argnums=(0,))

        ov = cfg.trainer.overfit_batches
        seed = cfg.trainer.seed

        if not self.is_image:
            target_gen = two_dim_data(cfg.data.dataset, _vector_dim(cfg))
            source_gen = _source_gen(cfg)

            def fused(state, key):
                k0, k1, ks = jax.random.split(key, 3)
                if ov:
                    k0 = _overfit_key(seed, 0, state.step, ov)
                    k1 = _overfit_key(seed, 1, state.step, ov)
                x0 = source_gen(k0, bs)
                x1 = target_gen(k1, bs)
                if core is not None:
                    return core(state, ks, x0, x1)
                return base_step(state, ks, x0, x1)

            return _finalize(fused, 0)

        on_device = getattr(self, "_device_data", None) is not None

        def prep(key, x1_u8):
            k0, k1, ks = jax.random.split(key, 3)
            x1 = normalize_images(x1_u8)
            if cfg.data.random_flip:
                x1 = random_hflip(k1, x1)
            x0 = jax.random.normal(k0, x1.shape)
            return ks, x0, x1

        step = core if core is not None else base_step

        if on_device:
            # Dataset passed as a device-resident argument (zero transfer);
            # batch indices drawn in-step.
            def _idx_key(state, kidx):
                return _overfit_key(seed, 2, state.step, ov) if ov else kidx

            def fused_uncond(state, key, dataset):
                kidx, key = jax.random.split(key)
                idx = jax.random.randint(_idx_key(state, kidx), (bs,), 0, dataset.shape[0])
                ks, x0, x1 = prep(key, dataset[idx])
                return step(state, ks, x0, x1)

            def fused_cond(state, key, dataset, labels):
                kidx, key = jax.random.split(key)
                idx = jax.random.randint(_idx_key(state, kidx), (bs,), 0, dataset.shape[0])
                ks, x0, x1 = prep(key, dataset[idx])
                y = labels[idx]
                return step(state, ks, x0, x1, y, y)

        else:
            def fused_uncond(state, key, x1_u8):
                ks, x0, x1 = prep(key, x1_u8)
                return step(state, ks, x0, x1)

            def fused_cond(state, key, x1_u8, y):
                ks, x0, x1 = prep(key, x1_u8)
                return step(state, ks, x0, x1, y, y)

        fn = fused_cond if cfg.model.class_cond else fused_uncond
        return _finalize(fn, 2 if cfg.model.class_cond else 1)

    # -- training ---------------------------------------------------------

    def fit(self, max_steps: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        total = cfg.trainer.total_steps if max_steps is None else max_steps
        start = int(self.state.step)
        if cfg.trainer.early_stop_metric and not cfg.trainer.eval_interval:
            # The early-stop check lives in the periodic eval loop; reject the
            # config upfront instead of silently never checking it. (Image
            # runs are eligible too: evaluate() reports tracking_fid/gen
            # stats, so e.g. early_stop_metric="tracking_fid" is meaningful.)
            raise ValueError("early_stop_metric requires eval_interval > 0")
        if not hasattr(self, "_fused"):
            self._fused = self._make_fused_step()
        fused = self._fused

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # The fused dp step runs inside shard_map with REPLICATED batch
            # inputs (every device holds the full uint8 batch — 1.5 MB at
            # B=128 — and prep/coupling run identically before the local
            # slice), so streamed batches are placed replicated too.
            batch_sharding = NamedSharding(self.mesh, PartitionSpec())
        else:
            batch_sharding = None

        def put(batch):
            if batch is None:
                return None

            def place(x):
                x = jnp.asarray(x)
                return (
                    jax.device_put(x, batch_sharding)
                    if batch_sharding is not None
                    else jax.device_put(x)
                )

            if cfg.model.class_cond:
                x, y = batch
                return place(x), place(y)
            x = batch[0] if isinstance(batch, tuple) else batch
            return place(x)

        on_device = getattr(self, "_device_data", None) is not None
        streaming = self.is_image and not on_device
        prefetched = put(next(self._batches)) if streaming else None
        # Debug-group hooks (reference runner/configs/debug/*.yaml): NaN
        # anomaly detection and the xplane fit profile. Both are scoped to
        # this fit() call — restored/stopped in the finally below.
        prev_debug_nans = None
        if cfg.trainer.debug_nans:
            prev_debug_nans = bool(jax.config.jax_debug_nans)
            jax.config.update("jax_debug_nans", True)
        if cfg.trainer.profile_dir:
            jax.profiler.start_trace(cfg.trainer.profile_dir)

        t0 = time.perf_counter()
        last_log_t, last_log_step = t0, start
        step = start
        es_best, es_bad = float("inf"), 0  # early-stopping state
        try:
            for i in range(start, total):
                self.key, step_key = jax.random.split(self.key)
                if on_device:
                    if cfg.model.class_cond:
                        self.state, metrics = fused(
                            self.state, step_key, self._device_data, self._device_labels
                        )
                    else:
                        self.state, metrics = fused(self.state, step_key, self._device_data)
                elif streaming:
                    nxt = put(next(self._batches))  # async: overlaps current step
                    if cfg.model.class_cond:
                        x1_u8, y = prefetched
                        self.state, metrics = fused(self.state, step_key, x1_u8, y)
                    else:
                        self.state, metrics = fused(self.state, step_key, prefetched)
                    prefetched = nxt
                else:
                    self.state, metrics = fused(self.state, step_key)
                step = i + 1
                if step % cfg.trainer.log_interval == 0 or step == total:
                    now = time.perf_counter()
                    sps = (step - last_log_step) / max(now - last_log_t, 1e-9)
                    last_log_t, last_log_step = now, step
                    out = {k: float(v) for k, v in metrics.items()}
                    out["steps_per_s"] = sps
                    # LR at this step from the warmup schedule — the
                    # reference's Lightning LearningRateMonitor callback
                    # (runner/configs/callbacks; host-side, no device work).
                    from cfm_tpu.train import warmup_lr_schedule

                    # step-1: optax saw counts 0..step-1; the LR that produced
                    # this step's update is schedule(step-1).
                    out["lr"] = float(warmup_lr_schedule(
                        cfg.optim.lr, cfg.optim.warmup_steps)(step - 1))
                    self.logger.log(step, out)
                    print(f"step {step:7d}  loss {out['loss']:.4f}  {sps:.2f} steps/s")
                    if not np.isfinite(out["loss"]):
                        # Fail fast instead of burning steps on a diverged run
                        # (reference's DSBM guard, cfm_module.py:1224-1225).
                        raise ValueError(f"Loss Not Finite at step {step}: {out['loss']}")
                if cfg.trainer.eval_interval and step % cfg.trainer.eval_interval == 0:
                    ev = self.evaluate()
                    self.logger.log(step, {f"eval/{k}": v for k, v in ev.items()})
                    print("  eval:", {k: round(v, 4) for k, v in ev.items()})
                    # Early stopping (reference runner's Lightning callback,
                    # runner/configs/callbacks/early_stopping.yaml: monitor/
                    # patience/min_delta, mode=min on an eval metric).
                    es = cfg.trainer.early_stop_metric
                    if es:
                        # Accept the logged "eval/"-prefixed spelling too, and
                        # fail with the valid names instead of a bare KeyError.
                        es_key = es[5:] if es.startswith("eval/") else es
                        if es_key not in ev:
                            raise ValueError(
                                f"early_stop_metric {es!r} is not an eval "
                                f"metric; available: {sorted(ev)}"
                            )
                        cur = float(ev[es_key])
                        if cur < es_best - cfg.trainer.early_stop_min_delta:
                            es_best, es_bad = cur, 0
                        else:
                            es_bad += 1
                            if es_bad >= cfg.trainer.early_stop_patience:
                                print(f"early stop at step {step}: {es} did not "
                                      f"improve past {es_best:.4f} for "
                                      f"{es_bad} evals")
                                break
                if (
                    self.is_image
                    and cfg.trainer.sample_grid_interval
                    and step % cfg.trainer.sample_grid_interval == 0
                ):
                    from .eval.plotting import image_grid

                    self.key, kg = jax.random.split(self.key)
                    imgs = self.generate(kg, cfg.trainer.sample_grid_n,
                                         method="euler", n_steps=cfg.eval.ode_steps)
                    path = image_grid(
                        imgs, nrow=8,
                        save_path=os.path.join(
                            cfg.trainer.ckpt_dir, cfg.name, f"samples_{step}.png"
                        ),
                    )
                    print(f"  saved sample grid: {path}")
                # Host-side step counter: reading state.step would sync the device
                # every iteration (a full tunnel round-trip on axon).
                self.ckpt.save(self.state, step=step)
        finally:
            if cfg.trainer.profile_dir:
                try:
                    jax.profiler.stop_trace()
                    print(f"xplane profile written under {cfg.trainer.profile_dir}")
                except RuntimeError:
                    pass  # trace already stopped (e.g. start failed)
            if prev_debug_nans is not None:
                jax.config.update("jax_debug_nans", prev_debug_nans)
            # Per-task execution time file (the reference's task_wrapper writes
            # exec_time.log for multirun bookkeeping,
            # runner/src/utils/utils.py:43-45). In the finally so early exits
            # (KeyboardInterrupt, non-finite loss) still record the steps
            # ACTUALLY executed, not the planned total.
            try:
                executed = max(step - start, 0)  # 0 when resuming a finished run
                with open(os.path.join(self.logger.log_dir, "exec_time.log"), "a") as fh:
                    fh.write(f"{cfg.name}: {executed} steps in "
                             f"{time.perf_counter() - t0:.1f}s\n")
            except OSError:
                pass
        self.ckpt.save(self.state, force=True)
        return self.state

    # -- evaluation -------------------------------------------------------

    def _flow_params(self, ema: bool = True):
        p = self.state.ema_params if ema else self.state.params
        return p["flow"] if self.score_model else p

    def generate(self, key: Array, n: int, method: Optional[str] = None,
                 n_steps: Optional[int] = None, y: Optional[Array] = None,
                 return_solution: bool = False):
        """Sample from the learned flow by ODE integration from the source.

        ``return_solution=True`` returns the full ODESolution (with the
        solver-counted NFE — the reference's `{prefix}/nfe` metric,
        runner/src/models/components/solver.py:96,121-141) instead of just
        the final samples.
        """
        cfg = self.cfg
        method = method or cfg.eval.ode_method
        n_steps = n_steps or cfg.eval.ode_steps
        # One jitted program per (n, method, n_steps, conditioned?) shape:
        # un-jitted sampling pays ~40% eager-dispatch overhead around the
        # scan (measured 71 vs 45 imgs/s at bs512 euler-100 on v5e).
        cache_key = (n, method, n_steps, y is not None)
        fn = self._gen_cache.get(cache_key) if hasattr(self, "_gen_cache") else None
        if not hasattr(self, "_gen_cache"):
            self._gen_cache = {}
        if fn is None:
            is_image, image_dim = self.is_image, cfg.model.image_dim
            source = None if is_image else _source_gen(cfg)
            apply_fn = self.model.apply
            ts = (jnp.linspace(0.0, 1.0, n_steps + 1)
                  if method != "dopri5" else jnp.array([0.0, 1.0]))

            @jax.jit
            def fn(params, key, y):
                if is_image:
                    h, w, c = image_dim
                    x0 = jax.random.normal(key, (n, h, w, c))
                else:
                    x0 = source(key, n)
                f = vector_field_from_model(apply_fn, params, y=y)
                return odeint(f, x0, ts, method=method, return_trajectory=False)

            self._gen_cache[cache_key] = fn
        sol = fn(self._flow_params(), key, y)
        return sol if return_solution else sol.final

    def generate_sde(self, key: Array, n: int, n_steps: Optional[int] = None,
                     logqp: bool = False):
        """Stochastic generation with the learned flow+score (SF2M eval path,
        reference cfm_module.py:911-983): dx = [v + s] dt + sigma dW."""
        if self.score_model is None:
            raise ValueError("SDE generation requires a score head (matcher.score_head)")
        cfg = self.cfg
        n_steps = n_steps or cfg.eval.ode_steps
        kx, kw = jax.random.split(key)
        if self.is_image:
            h, w, c = cfg.model.image_dim
            x0 = jax.random.normal(kx, (n, h, w, c))
        else:
            x0 = _source_gen(cfg)(kx, n)
        v = vector_field_from_model(self.model.apply, self.state.ema_params["flow"])
        s = vector_field_from_model(self.score_model.apply, self.state.ema_params["score"])
        sigma = cfg.matcher.sigma if cfg.matcher.sigma > 0 else 1.0
        solver = FlowSolver(drift=v, score=s, sigma=sigma)
        return solver.sdeint(kw, x0, jnp.linspace(0.0, 1.0, n_steps + 1),
                             logqp=logqp, return_trajectory=False)

    def tracking_fid(self, gen: Array) -> Optional[float]:
        """FID under the fixed random-conv tracking features between generated
        samples (normalized [-1, 1] floats) and the stashed real/uint8 slice.

        Weight-free, deterministic, monotone-tested (tests/test_fid.py) — the
        in-training quality curve the reference gets from test-time FID
        (runner cfm_module.py:474-483) without needing Inception weights. The
        absolute scale is NOT comparable to Inception FID; only the trend is
        meaningful. Returns None when no reference images are available.
        """
        ref = getattr(self, "_ref_images_u8", None)
        if ref is None:
            return None
        from .eval.fid import batched_features, fid_from_features, make_tracking_feature_fn

        if not hasattr(self, "_tracking_state"):
            feature_fn = make_tracking_feature_fn(self.cfg.model.image_dim)
            ref_feats = batched_features(feature_fn, ref)
            self._tracking_state = (feature_fn, ref_feats)
        feature_fn, ref_feats = self._tracking_state
        gen_u8 = np.asarray(
            jnp.clip((gen + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        )
        gen_feats = batched_features(feature_fn, gen_u8)
        return float(fid_from_features(gen_feats, ref_feats))

    def evaluate(self, n: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        n = n or cfg.eval.num_eval_samples
        self.key, kg, kt, ks = jax.random.split(self.key, 4)
        # Eval integrates with the configured method (dopri5 included — dense
        # output makes the adaptive rollout one while_loop) and logs the
        # solver-counted NFE, not a constant (reference solver.py:96,121-141).
        sol = self.generate(
            kg, n, method=cfg.eval.ode_method, n_steps=cfg.eval.ode_steps,
            return_solution=True,
        )
        gen = sol.final
        nfe = float(sol.nfe)
        if self.is_image:
            out = {"gen_mean": float(jnp.mean(gen)), "gen_std": float(jnp.std(gen)),
                   "nfe": nfe}
            tfid = self.tracking_fid(gen)
            if tfid is not None:
                out["tracking_fid"] = tfid
        else:
            target = two_dim_data(cfg.data.dataset, _vector_dim(cfg))(kt, n)
            out = {
                "w1": float(wasserstein(gen, target, power=1)),
                "w2": float(wasserstein(gen, target, power=2)),
                "nfe": nfe,
            }
        if self.score_model is not None and cfg.eval.sde:
            sde = self.generate_sde(ks, n, logqp=True)
            out["sde_kl"] = float(jnp.mean(sde.logqp))
            if not self.is_image:
                target = two_dim_data(cfg.data.dataset, _vector_dim(cfg))(kt, n)
                out["sde_w2"] = float(wasserstein(sde.final, target, power=2))
        return out
