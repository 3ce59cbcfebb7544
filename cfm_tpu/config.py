"""Typed configuration system: dataclass presets + dotted CLI overrides.

One config system covering both of the reference's tiers (SURVEY.md section 5
"Config / flag system"): the Hydra group tree of the runner
(/root/reference/runner/configs/train.yaml:1-51 — datamodule x model x
trainer x experiment overlays with command-line overrides) and the absl-flags
standalone scripts (examples/images/cifar10/train_cifar10.py:23-48).

Usage:
    cfg = load_config("cifar10_otcfm", ["optim.lr=1e-4", "trainer.total_steps=1000"])

Overrides use dotted paths with literal-eval'd values — the Hydra override
syntax, without the YAML indirection.
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple


@dataclass
class ModelConfig:
    kind: str = "mlp"                # mlp | unet
    # MLP family
    width: int = 64
    hidden_dims: Tuple[int, ...] = (64, 64, 64)
    activation: str = "selu"
    # UNet family (reference recipe defaults, train_cifar10.py:93-99)
    image_dim: Tuple[int, int, int] = (32, 32, 3)   # (H, W, C)
    num_channels: int = 128
    num_res_blocks: int = 2
    channel_mult: Optional[Tuple[float, ...]] = None
    num_heads: int = 4
    num_head_channels: int = 64
    attention_resolutions: str = "16"
    dropout: float = 0.1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    class_cond: bool = False
    num_classes: int = 10
    use_checkpoint: bool = False
    # Remat policy when use_checkpoint: None (save nothing) | "dots" |
    # "dots_no_batch" (see models/unet.UNetModel.checkpoint_policy).
    checkpoint_policy: Optional[str] = None
    bf16: bool = True


@dataclass
class MatcherConfig:
    kind: str = "otcfm"              # icfm | otcfm | fm | sbcfm | vpcfm
    sigma: float = 0.0
    ot_method: str = "exact"         # for sbcfm: exact | sinkhorn
    score_head: bool = False         # [SF]2M joint flow+score training


@dataclass
class DataConfig:
    dataset: str = "moons"           # 2d generator name | cifar10 | mnist
    source: str = "8gaussians"       # source distribution (2d) | "gaussian"
    # Sample dimensionality for dimension-aware vector generators
    # (funnel/gaussian — the reference's TorchDynDataModule system_kwargs
    # {dim: N}, configs/datamodule/funnel.yaml). 0 = the generator default.
    dim: int = 0
    data_dir: str = "data"
    batch_size: int = 256
    synthetic_fallback: bool = True  # fake images when no dataset on disk
    random_flip: bool = True
    # Keep the whole uint8 dataset resident in device HBM and gather batches
    # in-step (CIFAR-10 train = 150 MB). Eliminates all per-step host->device
    # traffic; batches are drawn with replacement instead of epoch shuffles.
    on_device: bool = True


@dataclass
class OptimConfig:
    lr: float = 2e-4
    warmup_steps: int = 5000
    grad_clip: float = 1.0
    ema_decay: float = 0.9999
    weight_decay: float = 0.0


@dataclass
class TrainerConfig:
    total_steps: int = 400001        # reference budget train_cifar10.py:33-37
    seed: int = 0
    log_interval: int = 100
    eval_interval: int = 5000
    ckpt_dir: str = "checkpoints"
    ckpt_interval: int = 20000       # reference save_step train_cifar10.py:46
    resume: bool = True
    data_parallel: bool = True
    # Save a generated sample grid every N steps for image runs (0 = off);
    # the reference's generate_samples at each save (utils_cifar.py:42-73).
    sample_grid_interval: int = 0
    sample_grid_n: int = 64
    # Early stopping on an eval metric (the reference runner's Lightning
    # EarlyStopping callback, runner/configs/callbacks/early_stopping.yaml:
    # monitor + patience + min_delta, mode=min). Checked at every eval
    # (eval_interval); "" disables. Patience counts evals without
    # improvement, like Lightning's check_on_train_epoch_end=False mode.
    early_stop_metric: str = ""
    early_stop_patience: int = 3
    early_stop_min_delta: float = 0.0
    # Debugging aids (the reference's debug config group, runner/configs/
    # debug/*.yaml — composed via the `debug=<mode>` override, see
    # apply_debug below):
    # Cycle the DATA draws through a fixed pool of N batches instead of fresh
    # i.i.d. draws (Lightning's trainer.overfit_batches, debug/overfit.yaml:
    # "overfits to 3 batches"). Noise/t/dropout randomness stays fresh —
    # only the data repeats, matching Lightning's dataloader-level reuse.
    overfit_batches: int = 0
    # Write a jax xplane profile of the whole fit() under this directory
    # (the reference's trainer.profiler, debug/profiler.yaml). "" = off.
    profile_dir: str = ""
    # Raise on the first NaN produced by any jitted op (jax_debug_nans) —
    # the reference's trainer.detect_anomaly (debug/default.yaml:34).
    # Restored to its previous value when fit() returns.
    debug_nans: bool = False


@dataclass
class EvalConfig:
    ode_method: str = "dopri5"
    ode_steps: int = 100             # for fixed-step generation
    num_eval_samples: int = 2048
    sde: bool = False


@dataclass
class Config:
    name: str = "experiment"
    model: ModelConfig = field(default_factory=ModelConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def tree_str(self) -> str:
        """Plain-text config tree for startup logging — the role of the
        reference's rich config-tree printing (runner/src/utils/utils.py:79-81,
        rich_utils.print_config_tree), with zero dependencies."""
        lines = [f"config: {self.name}"]

        def walk(d: Dict[str, Any], indent: str) -> None:
            items = list(d.items())
            for i, (k, v) in enumerate(items):
                last = i == len(items) - 1
                branch = "`-- " if last else "|-- "
                if isinstance(v, dict):
                    lines.append(f"{indent}{branch}{k}")
                    walk(v, indent + ("    " if last else "|   "))
                else:
                    lines.append(f"{indent}{branch}{k} = {v!r}")

        d = self.to_dict()
        d.pop("name", None)
        walk(d, "")
        return "\n".join(lines)


# --------------------------------------------------------------------------
# Presets — the experiment overlays (runner/configs/experiment/*.yaml analogue)
# --------------------------------------------------------------------------


def _preset_2d(matcher: str, **kw) -> Config:
    # Lipman Target-FM's path mu_t = t x1 ignores x0: its source MUST be the
    # standard Gaussian (generation integrates from where training started).
    source = "gaussian" if matcher == "fm" else "8gaussians"
    return Config(
        name=f"2d_{matcher}",
        model=ModelConfig(kind="mlp", width=64),
        matcher=MatcherConfig(kind=matcher, sigma=kw.pop("sigma", 0.1), **kw),
        data=DataConfig(dataset="moons", source=source, batch_size=256),
        optim=OptimConfig(lr=2e-3, warmup_steps=0, ema_decay=0.99),
        trainer=TrainerConfig(total_steps=5000, eval_interval=1000,
                              ckpt_interval=5000, data_parallel=False),
        eval=EvalConfig(ode_method="euler", num_eval_samples=2048),
    )


def _preset_cifar10(matcher: str) -> Config:
    """The reference headline recipe (train_cifar10.py:23-48,93-104)."""
    return Config(
        name=f"cifar10_{matcher}",
        model=ModelConfig(kind="unet", image_dim=(32, 32, 3), num_channels=128,
                          num_res_blocks=2, channel_mult=(1, 2, 2, 2),
                          num_heads=4, num_head_channels=64,
                          attention_resolutions="16", dropout=0.1),
        matcher=MatcherConfig(kind=matcher, sigma=0.0),
        data=DataConfig(dataset="cifar10", source="gaussian", batch_size=128),
        optim=OptimConfig(lr=2e-4, warmup_steps=5000, grad_clip=1.0,
                          ema_decay=0.9999),
        trainer=TrainerConfig(total_steps=400001, ckpt_interval=20000),
        eval=EvalConfig(ode_method="dopri5"),
    )


def _preset_mnist(matcher: str, class_cond: bool = False) -> Config:
    cfg = Config(
        name=f"mnist_{matcher}" + ("_cond" if class_cond else ""),
        model=ModelConfig(kind="unet", image_dim=(28, 28, 1), num_channels=32,
                          num_res_blocks=1, num_heads=1, num_head_channels=-1,
                          attention_resolutions="14", dropout=0.0,
                          class_cond=class_cond),
        matcher=MatcherConfig(kind=matcher, sigma=0.0),
        data=DataConfig(dataset="mnist", source="gaussian", batch_size=128),
        optim=OptimConfig(lr=2e-4, warmup_steps=500, ema_decay=0.999),
        trainer=TrainerConfig(total_steps=20000, ckpt_interval=5000),
        eval=EvalConfig(ode_method="euler"),
    )
    return cfg


_PRESETS: Dict[str, Any] = {}
for _m in ("icfm", "otcfm", "fm", "sbcfm", "vpcfm"):
    _PRESETS[f"2d_{_m}"] = lambda m=_m: _preset_2d(m)
    _PRESETS[f"cifar10_{_m}"] = lambda m=_m: _preset_cifar10(m)
    _PRESETS[f"mnist_{_m}"] = lambda m=_m: _preset_mnist(m)
_PRESETS["2d_sf2m"] = lambda: _preset_2d("sbcfm", sigma=1.0, score_head=True)
_PRESETS["mnist_otcfm_cond"] = lambda: _preset_mnist("otcfm", class_cond=True)


def available_presets() -> List[str]:
    return sorted(_PRESETS)


# --------------------------------------------------------------------------
# Debug overlays — the reference's debug config group
# (runner/configs/debug/{default,fdr,limit,overfit,profiler}.yaml), composed
# on the command line as `debug=<mode>` exactly like Hydra's group override.
# --------------------------------------------------------------------------

DEBUG_MODES = ("default", "fdr", "limit", "overfit", "profiler")


def apply_debug(cfg: Config, mode: str) -> Config:
    """Apply a debug overlay in place (and return cfg for chaining).

    Mapping from the reference's epoch-based Lightning knobs to this
    framework's step budget:

    - every mode: run name prefixed ``debug_`` (separate log/ckpt folders —
      the reference's ``task_name: "debug"``) and NaN detection on
      (``detect_anomaly: true`` -> ``jax_debug_nans``), except under the
      profiler where op-by-op NaN re-execution would destroy the trace.
    - ``default``: one short run (<=100 steps; reference: 1 epoch).
    - ``fdr``: 1 train step + 1 eval (reference fast_dev_run: 1 train/val/
      test step).
    - ``limit``: 1% of the step budget (reference limit_train_batches: 0.01).
    - ``overfit``: cycle 3 fixed data batches, eval/early-stop disabled
      (reference overfit_batches: 3, callbacks: null).
    - ``profiler``: xplane trace of the fit into logs/profile_<name>
      (reference trainer.profiler: "simple").
    """
    if mode not in DEBUG_MODES:
        raise ValueError(f"Unknown debug mode {mode!r}; one of {DEBUG_MODES}")
    t = cfg.trainer
    cfg.name = f"debug_{cfg.name}"
    t.debug_nans = True
    if mode == "default":
        t.total_steps = min(t.total_steps, 100)
        t.eval_interval = min(t.eval_interval, t.total_steps) if t.eval_interval else 0
        t.log_interval = min(t.log_interval, max(t.total_steps // 4, 1))
    elif mode == "fdr":
        t.total_steps = 1
        t.eval_interval = 1
        t.log_interval = 1
    elif mode == "limit":
        t.total_steps = max(t.total_steps // 100, 1)
        t.eval_interval = min(t.eval_interval, t.total_steps) if t.eval_interval else 0
        t.log_interval = min(t.log_interval, max(t.total_steps // 10, 1))
    elif mode == "overfit":
        t.overfit_batches = 3
        t.total_steps = min(t.total_steps, 2000)
        t.eval_interval = 0          # reference: callbacks disabled
        t.early_stop_metric = ""
        t.log_interval = min(t.log_interval, max(t.total_steps // 10, 1))
    elif mode == "profiler":
        t.debug_nans = False         # op-by-op NaN checks would poison the trace
        t.total_steps = min(t.total_steps, 100)
        t.eval_interval = 0
        t.log_interval = min(t.log_interval, max(t.total_steps // 4, 1))
        t.profile_dir = f"logs/profile_{cfg.name}"
    return cfg


def load_config(preset: Optional[str] = None, overrides: Sequence[str] = ()) -> Config:
    """Compose a preset (or a YAML config file) with ``key.path=value`` overrides.

    ``preset`` is either a registered preset name or a path to a ``.yaml`` /
    ``.yml`` file — the YAML tier of the reference's config system
    (runner/configs/**, SURVEY.md section 5): a YAML file may name a base
    preset via a top-level ``preset:`` key (the Hydra ``defaults:`` role) and
    override any nested field; CLI dotted overrides then apply on top, so
    precedence is preset < YAML < command line, matching Hydra's compose
    order (experiment overlay < command-line override).
    """
    if preset and (preset.endswith((".yaml", ".yml")) or "/" in preset):
        cfg = _load_yaml_config(preset)
    else:
        cfg = _PRESETS[preset]() if preset else Config()
    # `debug=<mode>` is a group override (Hydra `debug=fdr`): the overlay
    # applies before the remaining dotted overrides, so explicit keys still
    # win (e.g. `debug=overfit trainer.total_steps=50`). The one exception
    # is `name=`: the overlay PREFIXES the run name (and derives
    # profile_dir from it), so a user-supplied name must be applied first —
    # `debug=profiler name=myrun` runs as `debug_myrun`, keeping the
    # overlay's separate-folders guarantee instead of being stripped by
    # override ordering.
    debug_modes, rest = [], []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value, got {ov!r}")
        path, raw = ov.split("=", 1)
        path, raw = path.strip(), raw.strip()
        if path == "debug":
            debug_modes.append(raw)
        elif path == "name":
            _apply_override(cfg, path, raw)
        else:
            rest.append((path, raw))
    for mode in debug_modes:
        apply_debug(cfg, mode)
    for path, raw in rest:
        _apply_override(cfg, path, raw)
    return cfg


def _flatten(d: Dict[str, Any], prefix: str = "") -> List[Tuple[str, Any]]:
    out: List[Tuple[str, Any]] = []
    for k, v in d.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.extend(_flatten(v, path))
        else:
            out.append((path, v))
    return out


def _load_yaml_config(path: str) -> Config:
    """Build a Config from a YAML file (optionally based on a preset)."""
    import yaml

    with open(path) as fh:
        doc = yaml.safe_load(fh) or {}
    if not isinstance(doc, dict):
        raise ValueError(f"YAML config must be a mapping, got {type(doc).__name__}")
    base = doc.pop("preset", None)
    debug_mode = doc.pop("debug", None)
    cfg = _PRESETS[base]() if base else Config()
    # Same ordering contract as load_config: a YAML `name:` applies before
    # the debug overlay so the overlay prefixes the user's run name.
    name = doc.pop("name", None)
    if name is not None:
        cfg.name = str(name)
    if debug_mode:
        apply_debug(cfg, str(debug_mode))
    for dotted, value in _flatten(doc):
        _apply_value(cfg, dotted, value)
    return cfg


def save_config(cfg: Config, path: str) -> None:
    """Write a Config as YAML (round-trips through ``load_config(path)``)."""
    import yaml

    def clean(v):
        if isinstance(v, tuple):
            return [clean(x) for x in v]
        if isinstance(v, dict):
            return {k: clean(x) for k, x in v.items()}
        return v

    with open(path, "w") as fh:
        yaml.safe_dump(clean(cfg.to_dict()), fh, sort_keys=False)


def _apply_override(cfg: Any, path: str, raw: str) -> None:
    try:
        value = ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        value = raw  # bare string
    _apply_value(cfg, path, value)


def _apply_value(cfg: Any, path: str, value: Any) -> None:
    parts = path.split(".")
    obj = cfg
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise AttributeError(f"No config group {p!r} in {path!r}")
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise AttributeError(f"No config field {leaf!r} in {path!r}")
    current = getattr(obj, leaf)
    if current is not None and not isinstance(value, type(current)):
        # Coerce numerics (e.g. "1e-4" -> float field) and tuples from lists.
        if isinstance(current, float) and isinstance(value, int):
            value = float(value)
        elif isinstance(current, tuple) and isinstance(value, (list, tuple)):
            value = tuple(value)
        elif isinstance(current, bool) and isinstance(value, str):
            value = value.lower() in ("1", "true", "yes")
    setattr(obj, leaf, value)
