"""Plotting: trajectories, vector-field streams, sample grids.

Counterpart of the reference's plotting helpers
(/root/reference/runner/src/models/components/plotting.py:10-182 and
torchcfm/utils.py ``plot_trajectories``). Matplotlib only at call time —
importing this module does not pull in a GUI backend.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_trajectories(traj, n: int = 2000, save_path: Optional[str] = None):
    """2-D flow trajectories: start points, paths, end points
    (torchcfm/utils.py:55-65 styling: black start, olive path, blue end)."""
    plt = _plt()
    traj = np.asarray(traj)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(traj[0, :n, 0], traj[0, :n, 1], s=10, alpha=0.8, c="black", label="x0")
    ax.plot(traj[:, :n, 0], traj[:, :n, 1], alpha=0.1, c="olive", lw=0.8)
    ax.scatter(traj[-1, :n, 0], traj[-1, :n, 1], s=4, alpha=1.0, c="blue", label="x1")
    ax.legend()
    ax.set_xticks([])
    ax.set_yticks([])
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_scatter_and_flow(
    x, vector_field: Optional[Callable] = None, grid_n: int = 20,
    save_path: Optional[str] = None, t: float = 0.5,
):
    """Data scatter + vector-field quiver/stream (plotting.py:10-60)."""
    plt = _plt()
    x = np.asarray(x)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(x[:, 0], x[:, 1], s=4, alpha=0.5, c="tab:blue")
    if vector_field is not None:
        import jax.numpy as jnp

        lo, hi = x.min() - 1, x.max() + 1
        xs = np.linspace(lo, hi, grid_n)
        X, Y = np.meshgrid(xs, xs)
        pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], -1), jnp.float32)
        v = np.asarray(vector_field(t, pts)).reshape(grid_n, grid_n, 2)
        ax.streamplot(X, Y, v[..., 0], v[..., 1], color="gray", density=1.0, linewidth=0.7)
    ax.set_xticks([])
    ax.set_yticks([])
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def image_grid(images, nrow: int = 8, save_path: Optional[str] = None):
    """Tile NHWC images (in [-1,1] or uint8) into a grid png — the sample-grid
    role of utils_cifar.generate_samples (examples/images/cifar10/utils_cifar.py:42-73)."""
    plt = _plt()
    imgs = np.asarray(images)
    if imgs.dtype != np.uint8:
        imgs = np.clip(imgs * 127.5 + 127.5, 0, 255).astype(np.uint8)
    n, h, w, c = imgs.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros((ncol * h, nrow * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = imgs[i]
    fig, ax = plt.subplots(figsize=(nrow, ncol))
    ax.imshow(grid.squeeze(), cmap="gray" if c == 1 else None)
    ax.axis("off")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def store_trajectories(traj, path: str):
    """Save rollout trajectories as .npy (plotting.py ``store_trajectories``)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(traj))
    return path


def _timepoint_scatter(ax, obs):
    """Timepoint-colored scatter of a population: obs is a list of (n_t, 2)
    arrays (jagged) or a (bs, T, 2) array — the reference's scprep.scatter2d
    coloring (plotting.py:101-115) via a plain matplotlib colormap."""
    if isinstance(obs, (list, tuple)):
        data = [np.asarray(o) for o in obs]
        ts = len(data)
        pts = np.concatenate(data, axis=0)
        cs = np.concatenate([np.full(len(o), t) for t, o in enumerate(data)])
    else:
        arr = np.asarray(obs)
        bs, ts, _ = arr.shape
        pts = arr.reshape(-1, arr.shape[-1])
        cs = np.tile(np.arange(ts), bs)
    ax.scatter(pts[:, 0], pts[:, 1], s=3, c=cs, cmap="viridis", alpha=0.5)
    return ts


def plot_trajectory(obs, traj, n: int = 200, save_path: Optional[str] = None):
    """Timepoint-colored population scatter + a precomputed rollout overlay
    (reference plotting.py:91-125: black flow dots, purple final marker,
    red example paths)."""
    plt = _plt()
    traj = np.asarray(traj)
    fig, ax = plt.subplots(figsize=(6, 6))
    _timepoint_scatter(ax, obs)
    ax.scatter(traj[:, :n, 0], traj[:, :n, 1], s=0.3, alpha=0.2, c="black")
    ax.scatter(traj[-1, :n, 0], traj[-1, :n, 1], s=6, alpha=1.0, c="purple",
               marker="x")
    for i in range(min(20, traj.shape[1])):
        ax.plot(traj[:, i, 0], traj[:, i, 1], c="red", alpha=0.5)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_paths(obs, vector_field: Callable, n: int = 200,
               save_path: Optional[str] = None):
    """Like :func:`plot_trajectory` but integrates ``vector_field`` from the
    first marginal across global time [0, T-1] first (reference
    plotting.py:128-168, which rolls a torchdyn NeuralODE; here the scan
    euler integrator with the same >=20-steps-per-segment resolution)."""
    import jax.numpy as jnp

    from cfm_tpu.integrate import odeint

    start = (np.asarray(obs[0]) if isinstance(obs, (list, tuple))
             else np.asarray(obs)[:, 0])[:n]
    ts_count = len(obs) if isinstance(obs, (list, tuple)) else np.asarray(obs).shape[1]
    span = jnp.linspace(0.0, float(ts_count - 1), max(20 * ts_count, 100))
    sol = odeint(vector_field, jnp.asarray(start, jnp.float32), span,
                 method="euler", return_trajectory=True)
    return plot_trajectory(obs, np.asarray(sol.ys), n=n, save_path=save_path)


def plot_samples(images, nrow: int = 10, save_path: Optional[str] = None):
    """First 100 generated images as a grid (reference plotting.py:171-182's
    torchvision save_image role — image_grid with the same 10x10 layout)."""
    return image_grid(np.asarray(images)[:100], nrow=nrow, save_path=save_path)


def plot_graph_dist(graph_mean, graph_thresh, graph_std, ground_truth,
                    save_path: Optional[str] = None):
    """Posterior-graph diagnostic panel for GRN runs: ground truth vs the
    posterior mean, thresholded, and per-edge std adjacency heatmaps
    (reference runner/src/models/components/utils.py:25-46 plot_graph_dist —
    same four panels with shared viridis colormaps). Inputs are (d, d)
    adjacency arrays, e.g. from ``models.grn`` Bayesian/ensemble posteriors
    via ``eval.graphs`` summaries."""
    plt = _plt()
    panels = [("Ground Truth", ground_truth), ("Graph means", graph_mean),
              ("Graph post-threshold", graph_thresh), ("Graph std", graph_std)]
    fig, axs = plt.subplots(1, 4, figsize=(13, 4.5))
    for ax, (title, g) in zip(axs, panels):
        ax.set_title(title)
        pcm = ax.matshow(np.asarray(g), cmap="viridis")
        fig.colorbar(pcm, ax=ax)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig
