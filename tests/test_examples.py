"""Subprocess smoke tests for the example scripts.

The examples are the reference-parity user surface (SURVEY.md section 2.2);
these run each one from a FOREIGN working directory with tiny budgets, which
pins the sys.path anchoring (a cwd-dependent shim regressed in round 2) and
the end-to-end import->train->report path on CPU.
"""

import subprocess
import sys

import pytest

REPO = "/root/repo"


def _run(args, timeout=420):
    # Foreign cwd on purpose: the scripts must anchor imports to their own
    # file location, not to wherever the user happens to stand.
    return subprocess.run(
        [sys.executable] + args, cwd="/tmp", timeout=timeout,
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "",
             "PYTHONPATH": "", "HOME": "/root",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
    )


@pytest.mark.slow
def test_train_2d_smoke():
    r = _run([f"{REPO}/examples/train_2d.py", "--matcher", "icfm",
              "--steps", "30", "--batch", "64"])
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "2-moons W1=" in r.stdout


@pytest.mark.slow
def test_single_cell_smoke():
    r = _run([f"{REPO}/examples/single_cell.py", "--steps", "30", "--synthetic"])
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "Median_L2" in r.stdout or "W2" in r.stdout


@pytest.mark.slow
def test_tabular_forest_flow_smoke():
    r = _run([f"{REPO}/examples/tabular_forest_flow.py", "--n_t", "5",
              "--dup", "5", "--steps", "20"], timeout=420)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "W2" in r.stdout


def test_config_tree_str():
    from cfm_tpu.config import load_config

    s = load_config("2d_otcfm", ["optim.lr=0.5"]).tree_str()
    assert s.startswith("config: 2d_otcfm")
    assert "optim" in s and "lr = 0.5" in s
    # tree glyphs render nesting
    assert "|-- " in s and "`-- " in s


@pytest.mark.slow
def test_single_cell_joint_plans_smoke():
    """Geodesic joint-plan mode (VERDICT r3 item 5): trains from plans solved
    once up front instead of per-batch OT, including a leaveout straddle."""
    r = _run([f"{REPO}/examples/single_cell.py", "--steps", "30", "--synthetic",
              "--n", "256", "--joint-plans", "--leaveout", "2"])
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "joint plans up front" in r.stdout
    assert "Median_L2" in r.stdout or "W2" in r.stdout


@pytest.mark.slow
def test_train_mnist_conditional_smoke(tmp_path):
    """Conditional MNIST trainer end-to-end (guided matcher + class-cond
    UNet + sample grid; reference conditional_mnist.ipynb surface)."""
    r = _run([f"{REPO}/examples/train_mnist.py", "--matcher", "otcfm",
              "--steps", "3", "--batch_size", "16", "--synthetic",
              "--conditional", "--output_dir", str(tmp_path)], timeout=560)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert "saved samples" in r.stdout
    assert (tmp_path / "mnist_samples.png").exists()


@pytest.mark.slow
def test_train_mnist_sde_smoke(tmp_path):
    """SF2M-style MNIST: score head + SDE sampling (mnist_example.ipynb
    SDE cells)."""
    r = _run([f"{REPO}/examples/train_mnist.py", "--matcher", "sbcfm",
              "--steps", "3", "--batch_size", "16", "--synthetic",
              "--sde", "--output_dir", str(tmp_path)], timeout=560)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    assert (tmp_path / "mnist_samples.png").exists()
