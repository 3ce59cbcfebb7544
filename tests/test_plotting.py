"""Plotting helpers: every reference surface renders and saves
(runner/src/models/components/plotting.py:10-182, torchcfm/utils.py:55-65).
Headless Agg backend; asserts files exist and figures build without error."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from cfm_tpu.eval.plotting import (
    image_grid,
    plot_graph_dist,
    plot_paths,
    plot_samples,
    plot_scatter_and_flow,
    plot_trajectories,
    plot_trajectory,
    store_trajectories,
)


def test_all_plotting_surfaces(tmp_path):
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(21, 64, 2)).astype(np.float32)

    p = plot_trajectories(traj, n=32, save_path=str(tmp_path / "t.png"))
    assert os.path.exists(p)

    p = plot_scatter_and_flow(
        traj[0], vector_field=lambda t, x: -x, grid_n=8,
        save_path=str(tmp_path / "flow.png"))
    assert os.path.exists(p)

    obs_list = [rng.normal(size=(40, 2)).astype(np.float32) for _ in range(3)]
    p = plot_trajectory(obs_list, traj, n=32, save_path=str(tmp_path / "tj.png"))
    assert os.path.exists(p)

    obs_arr = rng.normal(size=(40, 3, 2)).astype(np.float32)
    p = plot_trajectory(obs_arr, traj, n=32, save_path=str(tmp_path / "tj2.png"))
    assert os.path.exists(p)

    p = plot_paths(obs_list, lambda t, x: -x, n=16,
                   save_path=str(tmp_path / "paths.png"))
    assert os.path.exists(p)

    imgs = rng.normal(size=(24, 8, 8, 3)).astype(np.float32)
    p = image_grid(imgs, nrow=6, save_path=str(tmp_path / "grid.png"))
    assert os.path.exists(p)
    p = plot_samples(imgs, save_path=str(tmp_path / "samples.png"))
    assert os.path.exists(p)

    store_trajectories(traj, str(tmp_path / "trajs.npy"))
    back = np.load(tmp_path / "trajs.npy")
    np.testing.assert_array_equal(back, traj)

    # GRN posterior-graph panel (reference components/utils.py:25-46).
    d = 5
    post = rng.uniform(size=(10, d, d)).astype(np.float32)
    p = plot_graph_dist(post.mean(0), (post.mean(0) > 0.5).astype(np.float32),
                        post.std(0), (rng.uniform(size=(d, d)) > 0.7),
                        save_path=str(tmp_path / "graph_dist.png"))
    assert os.path.exists(p)
