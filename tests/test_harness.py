"""Harness tests: config compose, 1-step end-to-end runs, checkpoint/resume.

Parity model: /root/reference/runner/tests/ — config-compose smoke
(test_configs.py:6-29), fast_dev_run (test_train.py:11-17), and the
checkpoint/resume round-trip (test_train.py:65-88).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu.config import available_presets, load_config
from cfm_tpu.trainer import Trainer, build_matcher, build_model


def test_all_presets_compose():
    for name in available_presets():
        cfg = load_config(name)
        assert cfg.name
        build_matcher(cfg)
        build_model(cfg)


def test_overrides():
    cfg = load_config("2d_otcfm", ["optim.lr=0.01", "data.batch_size=32",
                                   "matcher.sigma=0.5", "trainer.seed=7"])
    assert cfg.optim.lr == 0.01
    assert cfg.data.batch_size == 32
    assert cfg.matcher.sigma == 0.5
    with pytest.raises(AttributeError):
        load_config("2d_otcfm", ["nope.nope=1"])


def _fast_cfg(tmp_path, name="2d_icfm", extra=()):
    return load_config(name, [
        "trainer.total_steps=5",
        "trainer.log_interval=2",
        "trainer.eval_interval=0",
        "trainer.ckpt_interval=5",
        f"trainer.ckpt_dir={tmp_path}/ckpts",
        "data.batch_size=64",
        "eval.num_eval_samples=128",
        "eval.ode_steps=20",
        *extra,
    ])


def test_fast_dev_run_2d(tmp_path):
    """5 training steps + eval on the 2D preset (fast_dev_run analogue)."""
    trainer = Trainer(_fast_cfg(tmp_path), log_dir=str(tmp_path / "logs"))
    state = trainer.fit()
    assert int(state.step) == 5
    ev = trainer.evaluate(n=128)
    assert np.isfinite(ev["w2"])
    assert os.path.exists(trainer.logger.path)


def test_fast_dev_run_sf2m(tmp_path):
    cfg = _fast_cfg(tmp_path, name="2d_sf2m")
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit()
    assert int(state.step) == 5
    assert "flow" in state.params and "score" in state.params


def test_fast_dev_run_image_synthetic(tmp_path):
    """1-step image run on synthetic data with a tiny UNet."""
    cfg = load_config("mnist_otcfm", [
        "trainer.total_steps=1",
        "trainer.log_interval=1",
        "trainer.eval_interval=0",
        "trainer.ckpt_interval=0",
        f"trainer.ckpt_dir={tmp_path}/ckpts",
        "trainer.data_parallel=False",
        "data.batch_size=8",
        "model.num_channels=8",
        "model.num_res_blocks=1",
        "model.bf16=False",
    ])
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit()
    assert int(state.step) == 1


def test_checkpoint_resume_roundtrip(tmp_path):
    """Train 5, restart, resume to 8 — the reference's resume test pattern
    (runner/tests/test_train.py:65-88)."""
    cfg = _fast_cfg(tmp_path)
    t1 = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    t1.fit()
    params_after_5 = jax.tree.leaves(t1.state.params)[0]

    t2 = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    assert int(t2.state.step) == 5
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(t2.state.params)[0]),
        np.asarray(params_after_5),
    )
    t2.fit(max_steps=8)
    assert int(t2.state.step) == 8


def test_class_conditional_harness(tmp_path):
    cfg = load_config("mnist_otcfm_cond", [
        "trainer.total_steps=1",
        "trainer.eval_interval=0",
        "trainer.ckpt_interval=0",
        f"trainer.ckpt_dir={tmp_path}/ckpts",
        "trainer.data_parallel=False",
        "data.batch_size=8",
        "model.num_channels=8",
        "model.num_res_blocks=1",
        "model.bf16=False",
    ])
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit()
    assert int(state.step) == 1
    # Conditional generation.
    y = jnp.zeros((4,), jnp.int32)
    gen = trainer.generate(jax.random.PRNGKey(0), 4, method="euler", n_steps=4, y=y)
    assert gen.shape == (4, 28, 28, 1)


def test_sweep_grid_and_resilience(tmp_path):
    """Grid expansion + failure resilience (reference test_sweeps.py role)."""
    from cfm_tpu.sweep import expand_grid, run_sweep

    combos = expand_grid(["matcher.kind=icfm,otcfm", "optim.lr=0.001"])
    assert len(combos) == 2

    calls = []

    def run_fn(cfg):
        calls.append(cfg.matcher.kind)
        if cfg.matcher.kind == "otcfm":
            raise RuntimeError("boom")
        return {"w2": 0.5}

    recs = run_sweep("2d_icfm", ["matcher.kind=icfm,otcfm"], run_fn=run_fn)
    assert len(recs) == 2 and calls == ["icfm", "otcfm"]
    assert recs[0]["objective"] == 0.5
    assert "error" in recs[1]


def test_random_search():
    from cfm_tpu.sweep import choice, log_uniform, random_search

    def run_fn(cfg):
        return {"w2": abs(cfg.optim.lr - 1e-3)}

    best, trials = random_search(
        "2d_icfm", {"optim.lr": log_uniform(1e-4, 1e-2)}, n_trials=8, run_fn=run_fn
    )
    assert len(trials) == 8
    assert best["objective"] == min(t["objective"] for t in trials)


def test_tpe_search_converges_and_beats_random():
    """TPE (the reference's optuna.yaml sampler role) concentrates trials
    near the optimum of a deterministic objective: with the same budget, the
    post-startup TPE trials must average closer to the optimum than the
    startup (random) ones, and the best trial must land inside a tight
    neighborhood a pure-random budget of the same size rarely hits."""
    from cfm_tpu.sweep import Categorical, Float, tpe_search

    def run_fn(cfg):
        import math

        # Optimum at lr=1e-3, matcher=otcfm.
        penalty = 0.0 if cfg.matcher.kind == "otcfm" else 1.0
        return {"w2": (math.log10(cfg.optim.lr) + 3.0) ** 2 + penalty}

    best, trials = tpe_search(
        "2d_icfm",
        {
            "optim.lr": Float(1e-5, 1e-1, log=True),
            "matcher.kind": Categorical("icfm", "otcfm", "sbcfm"),
        },
        n_trials=24,
        run_fn=run_fn,
        n_startup=6,
        seed=0,
    )
    assert len(trials) == 24
    objs = [t["objective"] for t in trials]
    assert best["objective"] == min(objs)
    # Exploitation: later trials are better than the random startup on average.
    assert sum(objs[6:]) / 18 < sum(objs[:6]) / 6
    assert best["objective"] < 0.15
    assert best["params"]["matcher.kind"] == "otcfm"


def test_tpe_search_resilient_to_failures():
    from cfm_tpu.sweep import Float, tpe_search

    calls = []

    def run_fn(cfg):
        calls.append(cfg.optim.lr)
        if len(calls) % 3 == 0:
            raise RuntimeError("boom")
        return {"w2": cfg.optim.lr}

    best, trials = tpe_search(
        "2d_icfm", {"optim.lr": Float(1e-4, 1e-2, log=True)},
        n_trials=9, run_fn=run_fn, n_startup=3, seed=1,
    )
    assert len(trials) == 9
    assert sum("error" in t for t in trials) == 3
    assert best["objective"] == min(
        t["objective"] for t in trials if "objective" in t and t["objective"] is not None
    )


def test_cli_presets_and_train(tmp_path, monkeypatch, capsys):
    """CLI entry: presets listing and a 2-step train run."""
    from cfm_tpu import cli

    assert cli.main(["presets"]) == 0
    out = capsys.readouterr().out
    assert "cifar10_otcfm" in out and "2d_icfm" in out

    monkeypatch.chdir(tmp_path)
    rc = cli.main([
        "train", "2d_icfm",
        "trainer.total_steps=2", "trainer.log_interval=1",
        "trainer.eval_interval=0", "trainer.ckpt_interval=2",
        "data.batch_size=32", "eval.num_eval_samples=64", "eval.ode_steps=5",
    ])
    assert rc == 0
    rc = cli.main(["eval", "2d_icfm", "eval.num_eval_samples=64", "eval.ode_steps=5",
                   "trainer.eval_interval=0"])
    assert rc == 0
    assert cli.main(["bogus"]) == 2


# ---------------------------------------------------------------------------
# YAML config tier (reference runner/configs/**; VERDICT round-1 item 10)
# ---------------------------------------------------------------------------


def test_yaml_config_compose_and_precedence(tmp_path):
    import yaml

    from cfm_tpu.config import load_config

    p = tmp_path / "exp.yaml"
    p.write_text(
        "preset: cifar10_otcfm\n"
        "optim:\n  lr: 1.0e-3\n"
        "trainer:\n  total_steps: 123\n"
    )
    cfg = load_config(str(p))
    assert cfg.name == "cifar10_otcfm"
    assert cfg.optim.lr == 1e-3            # YAML overrides preset
    assert cfg.trainer.total_steps == 123
    assert cfg.model.num_channels == 128   # preset value survives
    # CLI overrides YAML.
    cfg2 = load_config(str(p), ["optim.lr=5e-4"])
    assert cfg2.optim.lr == 5e-4


def test_yaml_config_round_trip(tmp_path):
    from cfm_tpu.config import load_config, save_config

    cfg = load_config("2d_otcfm", ["trainer.total_steps=77"])
    out = tmp_path / "saved.yaml"
    save_config(cfg, str(out))
    back = load_config(str(out))
    assert back.to_dict() == cfg.to_dict()


def test_yaml_config_bad_field_raises(tmp_path):
    import pytest

    from cfm_tpu.config import load_config

    p = tmp_path / "bad.yaml"
    p.write_text("optim:\n  nonexistent_knob: 3\n")
    with pytest.raises(AttributeError):
        load_config(str(p))


def test_yaml_example_configs_load():
    import glob
    import os

    from cfm_tpu.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs", "experiment")
    paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert paths, "no example YAML configs found"
    for p in paths:
        cfg = load_config(p)
        assert cfg.trainer.total_steps > 0


def test_cli_train_yaml_config(tmp_path):
    from cfm_tpu.cli import main

    p = tmp_path / "quick.yaml"
    p.write_text(
        "preset: 2d_icfm\n"
        "trainer:\n  total_steps: 5\n  eval_interval: 1000\n"
        f"  ckpt_dir: {tmp_path / 'ckpt'}\n"
        "eval:\n  num_eval_samples: 64\n"
    )
    assert main(["train", str(p), "trainer.log_interval=1000"]) == 0


def test_parzen_bandwidths_positional_for_duplicates():
    """Duplicate observations must each keep their true neighbor-gap
    bandwidth (positional mapping), not all inherit the last duplicate's."""
    from cfm_tpu.sweep import _parzen_bandwidths

    lo, hi = 0.0, 10.0
    obs = [2.0, 5.0, 5.0, 9.0]
    sig = _parzen_bandwidths(obs, lo, hi)
    assert len(sig) == 4
    # x=2: neighbors lo and 5 -> max gap 3. First 5: left gap 3, right gap 0
    # (its duplicate) -> 3. Second 5: left 0, right 4 -> 4. x=9: left 4,
    # right hi gap 1 -> 4.
    assert sig[0] == pytest.approx(3.0)
    assert sig[1] == pytest.approx(3.0)
    assert sig[2] == pytest.approx(4.0)
    assert sig[3] == pytest.approx(4.0)
    # All clipped within [1%, 50%] of width regardless.
    assert all(0.1 <= s <= 5.0 for s in sig)


def test_early_stopping_halts_training(tmp_path):
    """EarlyStopping (reference runner/configs/callbacks/early_stopping.yaml
    role): with an impossible min_delta every eval counts as no-improvement,
    so training must halt after patience evals instead of running the full
    budget; exec_time.log records the steps actually executed."""
    cfg = _fast_cfg(tmp_path, extra=(
        "trainer.total_steps=60",
        "trainer.eval_interval=5",
        "trainer.early_stop_metric=w2",
        "trainer.early_stop_patience=2",
        "trainer.early_stop_min_delta=1e9",
    ))
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit()
    # First eval at step 5 sets the baseline? No: with min_delta=1e9 even
    # the first eval fails to improve on +inf - 1e9... inf-delta is still
    # inf, so eval 1 DOES improve; evals 2 and 3 then strike out -> stop at
    # step 15.
    assert int(state.step) == 15, int(state.step)
    log = open(os.path.join(trainer.logger.log_dir, "exec_time.log")).read()
    assert " 15 steps in " in log, log


def test_early_stopping_config_validation(tmp_path):
    """early_stop_metric must fail fast when it can never be checked (image
    runs / eval disabled) or names a non-existent eval metric — not silently
    no-op or KeyError mid-run."""
    import pytest

    cfg = _fast_cfg(tmp_path, extra=(
        "trainer.total_steps=10",
        "trainer.eval_interval=0",
        "trainer.early_stop_metric=w2",
    ))
    with pytest.raises(ValueError, match="eval_interval"):
        Trainer(cfg, log_dir=str(tmp_path / "logs")).fit()

    cfg = _fast_cfg(tmp_path, extra=(
        "trainer.total_steps=10",
        "trainer.eval_interval=5",
        "trainer.early_stop_metric=not_a_metric",
    ))
    with pytest.raises(ValueError, match="available"):
        Trainer(cfg, log_dir=str(tmp_path / "logs2")).fit()


def test_early_stopping_accepts_logged_metric_spelling(tmp_path):
    """'eval/w2' (the name the user sees in the CSV) works like 'w2'."""
    cfg = _fast_cfg(tmp_path, extra=(
        "trainer.total_steps=60",
        "trainer.eval_interval=5",
        "trainer.early_stop_metric=eval/w2",
        "trainer.early_stop_patience=2",
        "trainer.early_stop_min_delta=1e9",
    ))
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit()
    assert int(state.step) == 15, int(state.step)


def test_model_summary_logged(tmp_path):
    """Param count printed + persisted (reference ModelSummary callback and
    log_hyperparameters 'model/params/*', runner/src/utils/utils.py:149-155)."""
    import json

    cfg = _fast_cfg(tmp_path, extra=("trainer.total_steps=1",))
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    assert trainer.n_params > 1000
    hp = json.load(open(os.path.join(trainer.logger.log_dir,
                                     f"{cfg.name}_hparams.json")))
    assert hp["model/params/total"] == trainer.n_params
    assert hp["config"]["data"]["batch_size"] == cfg.data.batch_size


def test_tracking_fid_in_image_eval_decreases(tmp_path):
    """VERDICT r3 item 3: image-config evaluate() reports a finite
    tracking-FID that decreases with training, and the in-loop periodic eval
    logs it (the reference's quality curve comes from test-time FID,
    cfm_module.py:474-483; tracking-FID is the weight-free stand-in)."""
    cfg = load_config("mnist_otcfm", [
        "trainer.total_steps=150",
        "trainer.log_interval=50",
        "trainer.eval_interval=100",   # exercises the in-loop image eval
        "trainer.ckpt_interval=0",
        f"trainer.ckpt_dir={tmp_path}/ckpts",
        "trainer.data_parallel=False",
        "data.batch_size=32",
        "model.num_channels=8",
        "model.num_res_blocks=1",
        "model.bf16=False",
        "eval.num_eval_samples=256",
        "eval.ode_method=euler",
        "eval.ode_steps=10",
    ])
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    ev0 = trainer.evaluate()
    assert "tracking_fid" in ev0 and np.isfinite(ev0["tracking_fid"])
    trainer.fit()
    ev1 = trainer.evaluate()
    assert np.isfinite(ev1["tracking_fid"])
    assert ev1["tracking_fid"] < ev0["tracking_fid"], (ev0, ev1)
    # The periodic eval wrote the quality curve to the metric log.
    import json
    log_path = trainer.logger.log_dir
    jsonl = [p for p in os.listdir(log_path) if p.endswith(".jsonl")]
    assert jsonl, os.listdir(log_path)
    rows = [json.loads(l) for l in open(os.path.join(log_path, jsonl[0]))]
    assert any("eval/tracking_fid" in r for r in rows)


def test_trainer_data_parallel_shard_map(tmp_path):
    """Trainer data_parallel=True on the spoofed 8-device mesh: the fused
    step (in-step data prep + replicated coupling + per-shard model) runs
    inside one shard_map — Pallas custom calls have no GSPMD partitioning
    rule, so manual mode is the only multi-chip-correct home for them.
    Covers both the image (streamed + on-device) and 2D branches."""
    if len(jax.devices()) < 2:
        import pytest as _pytest
        _pytest.skip("needs the virtual multi-device mesh")
    for preset, extra in [
        ("mnist_otcfm", ["model.num_channels=8", "model.num_res_blocks=1",
                         "model.bf16=False", "data.batch_size=16"]),
        ("2d_otcfm", ["data.batch_size=32"]),
    ]:
        cfg = load_config(preset, [
            "trainer.total_steps=2",
            "trainer.log_interval=1",
            "trainer.eval_interval=0",
            "trainer.ckpt_interval=0",
            f"trainer.ckpt_dir={tmp_path}/ckpts_{preset}",
            "trainer.data_parallel=True",
        ] + extra)
        trainer = Trainer(cfg, log_dir=str(tmp_path / f"logs_{preset}"))
        assert trainer.mesh is not None
        state = trainer.fit()
        assert int(state.step) == 2


def test_lr_logged_with_warmup(tmp_path):
    """The metric log carries the scheduled LR (Lightning LearningRateMonitor
    parity): mid-warmup values ramp linearly toward optim.lr."""
    import json
    cfg = _fast_cfg(tmp_path)  # 5 steps
    cfg.optim.lr = 1e-3
    cfg.optim.warmup_steps = 10
    cfg.trainer.log_interval = 1
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs_lr"))
    trainer.fit()
    jsonl = [p for p in os.listdir(trainer.logger.log_dir) if p.endswith(".jsonl")]
    rows = [json.loads(l) for l in open(os.path.join(trainer.logger.log_dir, jsonl[0]))]
    lrs = {r["step"]: r["lr"] for r in rows if "lr" in r}
    assert lrs, rows[:2]
    np.testing.assert_allclose(lrs[5], 1e-3 * 5 / 10, rtol=1e-6)


# ---------------------------------------------------------------------------
# Debug config group (reference runner/configs/debug/*.yaml)
# ---------------------------------------------------------------------------


def test_debug_group_overlays(tmp_path):
    """`debug=<mode>` composes like the reference's Hydra debug group."""
    from cfm_tpu.config import DEBUG_MODES

    cfg = load_config("2d_otcfm", ["debug=fdr"])
    assert cfg.name == "debug_2d_otcfm"
    assert cfg.trainer.total_steps == 1
    assert cfg.trainer.eval_interval == 1
    assert cfg.trainer.debug_nans

    cfg = load_config("cifar10_otcfm", ["debug=limit"])
    assert cfg.trainer.total_steps == 400001 // 100

    cfg = load_config("2d_otcfm", ["debug=overfit"])
    assert cfg.trainer.overfit_batches == 3
    assert cfg.trainer.eval_interval == 0

    cfg = load_config("2d_otcfm", ["debug=profiler"])
    assert cfg.trainer.profile_dir
    assert not cfg.trainer.debug_nans  # would poison the trace

    # Explicit dotted overrides win over the overlay regardless of order.
    cfg = load_config("2d_otcfm", ["trainer.total_steps=7", "debug=fdr"])
    assert cfg.trainer.total_steps == 7

    with pytest.raises(ValueError):
        load_config("2d_otcfm", ["debug=nope"])
    assert set(DEBUG_MODES) == {"default", "fdr", "limit", "overfit", "profiler"}

    # YAML tier carries the group too (top-level `debug:` key).
    p = tmp_path / "dbg.yaml"
    p.write_text("preset: 2d_icfm\ndebug: fdr\n")
    cfg = load_config(str(p))
    assert cfg.name == "debug_2d_icfm" and cfg.trainer.total_steps == 1


def test_debug_fdr_runs_and_restores_nan_flag(tmp_path):
    """debug=fdr trains 1 step + 1 eval with jax_debug_nans scoped to fit()."""
    cfg = load_config("2d_icfm", [
        "debug=fdr",
        f"trainer.ckpt_dir={tmp_path}/ckpts",
        "data.batch_size=32",
        "eval.num_eval_samples=64",
        "eval.ode_steps=5",
    ])
    assert not jax.config.jax_debug_nans
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit()
    assert int(state.step) == 1
    assert not jax.config.jax_debug_nans  # restored after fit
    ev_rows = [p for p in os.listdir(trainer.logger.log_dir) if p.endswith(".jsonl")]
    assert ev_rows


def test_debug_profiler_writes_xplane(tmp_path):
    """debug=profiler produces an xplane trace of the fit."""
    import glob

    prof_dir = str(tmp_path / "prof")
    cfg = load_config("2d_icfm", [
        "debug=profiler",
        f"trainer.profile_dir={prof_dir}",
        "trainer.total_steps=2",
        f"trainer.ckpt_dir={tmp_path}/ckpts",
        "data.batch_size=32",
    ])
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    trainer.fit()
    traces = glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no xplane trace under {prof_dir}"


def test_overfit_key_cycles():
    """The overfit data key repeats with period n and differs within it."""
    from cfm_tpu.trainer import _overfit_key

    k0 = _overfit_key(0, 1, 0, 3)
    k3 = _overfit_key(0, 1, 3, 3)
    k1 = _overfit_key(0, 1, 1, 3)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k3))
    assert not np.array_equal(np.asarray(k0), np.asarray(k1))
    # Different salts (source vs target vs image-index) decorrelate.
    assert not np.array_equal(
        np.asarray(_overfit_key(0, 0, 0, 3)), np.asarray(_overfit_key(0, 1, 0, 3))
    )


def _data_checksums_over_steps(tmp_path, tag, preset, extra, n_steps=3):
    """Run fit() with the raw train step stubbed to report the data batch
    checksum each step; returns the per-step (x0_sum, x1_sum) sequence."""
    import json

    cfg = load_config(preset, [
        "data.batch_size=16",
        f"trainer.total_steps={n_steps}",
        "trainer.log_interval=1",
        "trainer.eval_interval=0",
        "trainer.ckpt_interval=0",
        "trainer.data_parallel=False",
        f"trainer.ckpt_dir={tmp_path}/ckpts_{tag}",
        *extra,
    ])
    trainer = Trainer(cfg, log_dir=str(tmp_path / f"logs_{tag}"))

    def probe_step(state, key, x0, x1, *rest):
        metrics = {"loss": jnp.float32(0.0),
                   "x0_sum": jnp.sum(x0.astype(jnp.float32)),
                   "x1_sum": jnp.sum(x1.astype(jnp.float32))}
        return state._replace(step=state.step + 1), metrics

    trainer._raw_step = probe_step  # before _make_fused_step runs
    trainer.fit()
    rows = [json.loads(l) for l in open(trainer.logger.jsonl_path)]
    return [(r["x0_sum"], r["x1_sum"]) for r in rows if "x1_sum" in r]


def test_overfit_repeats_data_2d(tmp_path):
    """overfit_batches=1 feeds the SAME data batch every step (2D generator
    path); without it, draws are fresh i.i.d. — the Lightning
    overfit_batches contract (reference debug/overfit.yaml)."""
    ov = _data_checksums_over_steps(
        tmp_path, "ov2d", "2d_icfm", ["trainer.overfit_batches=1"])
    iid = _data_checksums_over_steps(tmp_path, "iid2d", "2d_icfm", [])
    assert len(ov) == 3 and len(iid) == 3
    assert ov[0] == ov[1] == ov[2], ov
    assert len({t[1] for t in iid}) == 3, iid


def test_overfit_repeats_data_image(tmp_path):
    """Same contract on the on-device image path: the gathered uint8 batch
    (x1 before augmentation) cycles; the noise source x0 stays fresh."""
    extra = ["model.num_channels=8", "model.num_res_blocks=1",
             "model.bf16=False", "data.random_flip=False"]
    ov = _data_checksums_over_steps(
        tmp_path, "ovim", "mnist_icfm", extra + ["trainer.overfit_batches=1"])
    iid = _data_checksums_over_steps(tmp_path, "iidim", "mnist_icfm", extra)
    x1s = [t[1] for t in ov]
    assert x1s[0] == x1s[1] == x1s[2], ov          # data cycles
    assert len({t[0] for t in ov}) == 3, ov        # noise stays fresh
    assert len({t[1] for t in iid}) == 3, iid


def test_funnel_dataset_trains_end_to_end(tmp_path):
    """The reference's funnel datamodule (configs/datamodule/funnel.yaml,
    10-d Neal's funnel) as a vector dataset: MLP sized to dim, gaussian
    source matched to the funnel dim, train + eval run."""
    cfg = load_config("2d_icfm", [
        "data.dataset=funnel",
        "data.source=gaussian",
        "data.batch_size=64",
        "trainer.total_steps=3",
        "trainer.log_interval=1",
        "trainer.eval_interval=3",
        "eval.num_eval_samples=64",
        "eval.ode_steps=5",
        f"trainer.ckpt_dir={tmp_path}/ckpts",
    ])
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    assert trainer.model.dim == 10  # funnel.yaml system_kwargs dim: 10
    trainer.fit()
    out = trainer.evaluate()
    assert np.isfinite(out["w2"]) and np.isfinite(out["w1"])

    # Explicit data.dim overrides the funnel default everywhere.
    cfg = load_config("2d_icfm", ["data.dataset=funnel", "data.dim=4"])
    assert Trainer(cfg, log_dir=str(tmp_path / "logs4")).model.dim == 4


def test_param_summary_table(tmp_path, capsys):
    """Per-module parameter table (RichModelSummary role, callbacks/
    model_summary.yaml): groups sum to the total, env flag prints it."""
    from cfm_tpu.utils import count_params, param_summary

    cfg = load_config("2d_icfm", [f"trainer.ckpt_dir={tmp_path}/ck"])
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    table = param_summary(trainer.state.params, max_depth=2)
    rows = table.splitlines()
    assert rows[-1].startswith("TOTAL")
    total = int(rows[-1].split()[-1].replace(",", ""))
    assert total == count_params(trainer.state.params) == trainer.n_params
    per_module = sum(int(r.split()[-1].replace(",", "")) for r in rows[:-1])
    assert per_module == total

    os.environ["CFM_TPU_MODEL_SUMMARY"] = "1"
    try:
        capsys.readouterr()
        Trainer(cfg, log_dir=str(tmp_path / "logs2"))
        out = capsys.readouterr().out
        assert "TOTAL" in out and "Dense_0" in out
    finally:
        del os.environ["CFM_TPU_MODEL_SUMMARY"]


def test_one_shot_state_save_restore(tmp_path):
    """The manager-free one-shot checkpoint API round-trips a TrainState
    bit-for-bit (the reference's plain torch.save role,
    examples/images/cifar10/train_cifar10.py:157-166)."""
    from cfm_tpu.checkpoint import restore_train_state, save_train_state
    from cfm_tpu.models import MLP
    from cfm_tpu.train import init_train_state, make_optimizer

    model = MLP(dim=2, w=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2,)), jnp.zeros((2, 2)))
    state = init_train_state(params, make_optimizer(lr=1e-3, warmup_steps=0))
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "oneshot")
    save_train_state(path, state)
    zero = jax.tree.map(jnp.zeros_like, state)
    back = restore_train_state(path, zero)
    assert int(back.step) == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profiling_timer_helpers():
    """time_fn returns a sane per-call time; measure_sync_overhead >= 0."""
    from cfm_tpu.profiling import measure_sync_overhead, time_fn

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((8, 8))
    dt = time_fn(f, x, iters=5, warmup=1)
    assert 0.0 < dt < 1.0
    assert measure_sync_overhead() >= 0.0


def test_funnel_with_default_source_falls_back_to_gaussian(tmp_path):
    """data.dataset=funnel with the preset-default '8gaussians' source must
    run (review finding r5): the source falls back to the matching-dim
    standard normal, matching the reference's N(0,I) base for funnel."""
    cfg = load_config("2d_otcfm", [
        "data.dataset=funnel",
        "data.batch_size=32",
        "trainer.total_steps=2",
        "trainer.eval_interval=2",
        "trainer.log_interval=1",
        "eval.num_eval_samples=32",
        "eval.ode_steps=4",
        f"trainer.ckpt_dir={tmp_path}/ck",
    ])
    assert cfg.data.source == "8gaussians"  # untouched config
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    trainer.fit()
    out = trainer.evaluate()
    assert np.isfinite(out["w2"])


def test_debug_name_override_keeps_prefix(tmp_path):
    """`debug=<mode> name=myrun` runs as debug_myrun with profile_dir
    derived from it (review finding r5), in both CLI and YAML tiers."""
    cfg = load_config("2d_otcfm", ["debug=profiler", "name=myrun"])
    assert cfg.name == "debug_myrun"
    assert cfg.trainer.profile_dir == "logs/profile_debug_myrun"
    cfg = load_config("2d_otcfm", ["name=myrun", "debug=fdr"])
    assert cfg.name == "debug_myrun"

    p = tmp_path / "named.yaml"
    p.write_text("preset: 2d_icfm\nname: myrun\ndebug: fdr\n")
    cfg = load_config(str(p))
    assert cfg.name == "debug_myrun"


def test_overfit_composes_with_data_parallel(tmp_path):
    """debug=overfit under data_parallel: the overfit data keys are computed
    identically on every shard (the dp design generates the global batch
    replicated, then slices per device), so the combination must train and
    stay deterministic across runs."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    def run(tag):
        cfg = load_config("2d_otcfm", [
            "debug=overfit",
            "trainer.total_steps=3",
            "trainer.log_interval=1",
            "trainer.ckpt_interval=0",
            "trainer.data_parallel=True",
            "data.batch_size=32",
            f"trainer.ckpt_dir={tmp_path}/ck_{tag}",
        ])
        assert cfg.trainer.overfit_batches == 3
        trainer = Trainer(cfg, log_dir=str(tmp_path / f"logs_{tag}"))
        assert trainer.mesh is not None
        trainer.fit()
        import json
        rows = [json.loads(l) for l in open(trainer.logger.jsonl_path)]
        return [r["loss"] for r in rows if "loss" in r]

    a, b = run("a"), run("b")
    assert len(a) == 3 and a == b  # same keys end to end -> bitwise replay


def test_data_parallel_rejects_indivisible_batch(tmp_path):
    """A global batch that does not divide the mesh raises at trace time
    instead of silently dropping the remainder rows (review finding r5)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    cfg = load_config("2d_otcfm", [
        "trainer.total_steps=1",
        "trainer.data_parallel=True",
        "data.batch_size=30",     # 30 % 8 != 0
        f"trainer.ckpt_dir={tmp_path}/ck",
    ])
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    with pytest.raises(AssertionError, match="must divide"):
        trainer.fit()


def test_categorical_rejects_comma_options():
    """Commas are the sweep grid separator; a Categorical option containing
    one would be silently re-split by run_sweep (review finding r5)."""
    from cfm_tpu.sweep import Categorical

    with pytest.raises(ValueError, match="comma"):
        Categorical("64,64", "128,128")
    assert Categorical("64x64").options == ("64x64",)
