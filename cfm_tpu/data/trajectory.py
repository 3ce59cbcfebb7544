"""Trajectory (multi-timepoint) datasets and batch preprocessing.

TPU-native counterpart of the reference's trajectory stack: the per-timepoint
segment selection with leaveout masking of ``CFMLitModule.preprocess_batch``
(/root/reference/runner/src/models/cfm_module.py:142-199), the h5ad/npz
single-cell loaders (runner/src/datamodules/components/time_dataset.py:5-22),
and the synthetic TREE/CIRCLE/CYCLE populations of tnet_dataset.py (14-886).

Batch convention: a trajectory batch is X (bs, T, D) — one row per sampled
"cell", one slice per timepoint. ``sample_segment_pairs`` draws, per sample,
a random adjacent timepoint pair (skipping a left-out timepoint during
training, doubling the step across the gap) — keyed and fully vectorized, no
per-sample python loop.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sample_segment_pairs(
    key: Array,
    X: Array,
    leaveout_timepoint: int = -1,
    training: bool = True,
) -> Tuple[Array, Array, Array]:
    """Per-sample random adjacent-timepoint pairs from X (bs, T, ...).

    Returns (x0, x1, t_select) where x0 = X[i, t_select[i]],
    x1 = X[i, t_select[i]+1] — except around a left-out timepoint, where the
    pair straddles it (reference :142-175: the t_select skip and the
    ti_next == leaveout increment).
    """
    bs, T = X.shape[0], X.shape[1]
    if training and 0 < leaveout_timepoint < T:
        # Draw from T-2 options, skipping segments that would *start* at the
        # left-out timepoint. For leaveout == T-1 (the LAST timepoint) the
        # shift below never fires and the support is 0..T-3 — the final
        # segment (which ends at the held-out marginal) is never drawn,
        # exactly the reference's randint(times-2) behavior
        # (cfm_module.py:167-171); the old < T-1 guard silently trained on
        # the held-out last timepoint.
        t_sel = jax.random.randint(key, (bs,), 0, T - 2)
        t_sel = jnp.where(t_sel >= leaveout_timepoint, t_sel + 1, t_sel)
        t_next = t_sel + 1
        # Segment ending at the left-out timepoint jumps over it.
        t_next = jnp.where(t_next == leaveout_timepoint, t_next + 1, t_next)
    else:
        t_sel = jax.random.randint(key, (bs,), 0, T - 1)
        t_next = t_sel + 1
    idx = jnp.arange(bs)
    x0 = X[idx, t_sel]
    x1 = X[idx, t_next]
    return x0, x1, t_sel


def leaveout_adjusted_targets(
    ut: Array, t: Array, t_select: Array, leaveout_timepoint: int
) -> Tuple[Array, Array]:
    """Reference :225-242: for pairs straddling the left-out timepoint the
    target velocity halves (the segment spans 2 time units) and the local t
    doubles."""
    straddles = t_select + 1 == leaveout_timepoint
    ut = jnp.where(straddles.reshape(-1, *([1] * (ut.ndim - 1))), ut / 2.0, ut)
    t = jnp.where(straddles, t * 2.0, t)
    return ut, t


# --------------------------------------------------------------------------
# Synthetic single-cell populations (tnet_dataset.py analogues)
# --------------------------------------------------------------------------


def tree_population(key: Array, n: int, T: int = 5, dim: int = 2) -> Array:
    """Branching "TREE" population: points diffuse outward along one of two
    branches over time (TreeTestData analogue). Returns (n, T, dim)."""
    k_branch, k_noise = jax.random.split(key)
    branch = jnp.where(jax.random.bernoulli(k_branch, 0.5, (n,)), 1.0, -1.0)
    ts = jnp.linspace(0.0, 1.0, T)
    noise = 0.1 * jax.random.normal(k_noise, (n, T, dim))
    base = jnp.zeros((n, T, dim))
    base = base.at[:, :, 0].add(ts[None, :])                       # drift right
    base = base.at[:, :, 1].add(branch[:, None] * ts[None, :] ** 2)  # branch
    return base + noise


def circle_population(key: Array, n: int, T: int = 5, dim: int = 2) -> Array:
    """Points rotating around a circle over time (CircleTestData analogue)."""
    k0, k1 = jax.random.split(key)
    theta0 = jax.random.uniform(k0, (n,), maxval=2 * jnp.pi)
    ts = jnp.linspace(0.0, jnp.pi / 2, T)
    theta = theta0[:, None] + ts[None, :]
    out = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return out + 0.05 * jax.random.normal(k1, (n, T, 2))


# --------------------------------------------------------------------------
# On-disk single-cell loaders
# --------------------------------------------------------------------------


def load_h5ad_timeseries(
    path: str, obsm_key: str = "X_pca", time_key: str = "day", max_dim: Optional[int] = None
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Read an .h5ad (HDF5) single-cell file without scanpy.

    Returns (list of per-timepoint arrays, sorted unique times) — the
    jagged-timepoint representation the eval metrics accept. Reference
    ``adata_dataset`` (time_dataset.py:5-15) reads the same keys via scanpy.
    """
    import h5py

    with h5py.File(path, "r") as f:
        emb = np.asarray(f["obsm"][obsm_key])
        obs = f["obs"][time_key]
        if isinstance(obs, h5py.Group):  # categorical storage
            codes = np.asarray(obs["codes"])
            cats = np.asarray(obs["categories"])
            times = cats[codes].astype(float)
        else:
            times = np.asarray(obs).astype(float)
    if max_dim:
        emb = emb[:, :max_dim]
    uniq = np.sort(np.unique(times))
    return [emb[times == t] for t in uniq], uniq


def load_npz_timeseries(
    path: str, x_key: str = "pcs", time_key: str = "sample_labels", max_dim: Optional[int] = None
) -> Tuple[List[np.ndarray], np.ndarray]:
    """npz loader (reference ``tnet_dataset``, time_dataset.py:18-22)."""
    d = np.load(path, allow_pickle=True)
    emb = np.asarray(d[x_key])
    times = np.asarray(d[time_key]).astype(float)
    if max_dim:
        emb = emb[:, :max_dim]
    uniq = np.sort(np.unique(times))
    return [emb[times == t] for t in uniq], uniq


def resample_to_trajectory(
    key: Array, marginals: List[np.ndarray], batch_size: int
) -> Array:
    """Stack jagged per-timepoint marginals into a (bs, T, D) batch by
    uniform resampling per timepoint (the CombinedLoader min_size analogue,
    distribution_datamodule.py:23-89)."""
    cols = []
    for ti, m in enumerate(marginals):
        k = jax.random.fold_in(key, ti)
        idx = jax.random.randint(k, (batch_size,), 0, m.shape[0])
        cols.append(jnp.asarray(m)[idx])
    return jnp.stack(cols, axis=1)


def whiten(marginals: List[np.ndarray]) -> Tuple[List[np.ndarray], np.ndarray, np.ndarray]:
    """Global mean/std whitening across all timepoints (reference
    CustomTrajectoryDataModule hvg+whiten path, distribution_datamodule.py:92-187)."""
    full = np.concatenate(marginals, axis=0)
    mu = full.mean(0)
    std = full.std(0) + 1e-8
    return [(m - mu) / std for m in marginals], mu, std


def load_h5ad_joint_plans(path: str, n_timepoints: int, leaveout: bool = False):
    """Read precomputed joint OT plans from an .h5ad ``uns`` group.

    Counterpart of the reference's geodesic datamodule
    (distribution_datamodule.py:190-281: ``adata.uns["pi_{t}_{t+1}"]`` per
    adjacent pair, plus ``pi_{t+1}`` straddling plans for leaveout). The
    returned plans feed ``OTPlanSampler.sample_map`` directly — precomputed
    couplings replace the per-batch OT solve.
    """
    import h5py

    with h5py.File(path, "r") as f:
        uns = f["uns"]
        plans = [np.asarray(uns[f"pi_{t}_{t+1}"]) for t in range(n_timepoints - 1)]
        straddle = (
            [np.asarray(uns[f"pi_{t+1}"]) for t in range(n_timepoints - 2)]
            if leaveout
            else None
        )
    return plans, straddle


def make_joint_plan_sampler(
    marginals: List[np.ndarray],
    plans: List[np.ndarray],
    leaveout_timepoint: int = -1,
    straddle_plans: Optional[List[np.ndarray]] = None,
):
    """Jit-native pair sampler over PRECOMPUTED joint OT plans.

    TPU-first re-design of the reference geodesic datamodule's per-sample
    host loop (distribution_datamodule.py:190-281 ``HAS_JOINT_PLANS`` +
    cfm_module.py:180-189: index batches, ``np.random.choice`` per row):
    plan rows are converted to CDFs once up front, and the returned
    ``sample(key, batch_size) -> (x0, x1, t_select)`` draws the whole batch
    inside one traced program — a static python loop over the (few) segments,
    per-segment uniform row draws and an inverse-CDF column draw
    (vmapped searchsorted), then a where-select by ``t_select``. No host
    callbacks, static shapes, jagged per-timepoint sizes allowed.

    With ``leaveout_timepoint`` set (training-time holdout), segment
    ``leaveout-1`` straddles to ``leaveout+1`` through the corresponding
    ``straddle_plans`` entry (the reference's ``pi_leaveout``), and
    ``t_select`` never starts at the left-out timepoint — compose with
    :func:`leaveout_adjusted_targets` exactly like the solve-per-batch path.
    """
    T = len(marginals)
    data = [jnp.asarray(np.asarray(m), jnp.float32) for m in marginals]
    dim = data[0].shape[1]

    segs = {}
    for t in range(T - 1):
        if t + 1 == leaveout_timepoint and leaveout_timepoint == T - 1:
            continue  # last-timepoint holdout: no straddle target exists
        if t + 1 == leaveout_timepoint and 0 < leaveout_timepoint < T - 1:
            if straddle_plans is None:
                raise ValueError(
                    "leaveout_timepoint set but no straddle_plans given"
                )
            pi = np.asarray(straddle_plans[t], np.float64)
            tgt = t + 2
        elif t == leaveout_timepoint and 0 < leaveout_timepoint < T - 1:
            continue  # segments never start at the left-out timepoint
        else:
            pi = np.asarray(plans[t], np.float64)
            tgt = t + 1
        if pi.shape != (data[t].shape[0], data[tgt].shape[0]):
            raise ValueError(
                f"plan {t} has shape {pi.shape}, expected "
                f"({data[t].shape[0]}, {data[tgt].shape[0]})"
            )
        cdf = np.cumsum(pi, axis=1)  # unnormalized row CDFs
        segs[t] = (data[t], data[tgt], jnp.asarray(cdf, jnp.float32))

    def _draw_cols(cdf_rows: Array, u: Array) -> Array:
        # Inverse-CDF draw per row; u scaled by the row total handles
        # unnormalized plans (the reference normalizes each row before
        # np.random.choice, cfm_module.py:186-188).
        def one(c, uu):
            return jnp.searchsorted(c, uu * c[-1], side="right")

        j = jax.vmap(one)(cdf_rows, u)
        return jnp.clip(j, 0, cdf_rows.shape[1] - 1).astype(jnp.int32)

    def sample(key: Array, batch_size: int):
        k_t, k_i, k_u = jax.random.split(key, 3)
        if 0 < leaveout_timepoint < T:
            t_sel = jax.random.randint(k_t, (batch_size,), 0, T - 2)
            t_sel = jnp.where(t_sel >= leaveout_timepoint, t_sel + 1, t_sel)
        else:
            t_sel = jax.random.randint(k_t, (batch_size,), 0, T - 1)
        u = jax.random.uniform(k_u, (batch_size,))
        x0 = jnp.zeros((batch_size, dim), jnp.float32)
        x1 = jnp.zeros((batch_size, dim), jnp.float32)
        for t, (x0_data, x1_data, cdf) in segs.items():
            ki = jax.random.fold_in(k_i, t)
            i = jax.random.randint(ki, (batch_size,), 0, x0_data.shape[0])
            j = _draw_cols(cdf[i], u)
            m = (t_sel == t)[:, None]
            x0 = jnp.where(m, x0_data[i], x0)
            x1 = jnp.where(m, x1_data[j], x1)
        return x0, x1, t_sel

    return sample


def cycle_population(key: Array, n: int, T: int = 5, noise: float = 0.05) -> Array:
    """Oscillatory population cycling between two states over time — the
    CycleDataset role (tnet_dataset.py): timepoints alternate phases around a
    limit cycle, so marginals at t and t+2 coincide."""
    k0, k1 = jax.random.split(key)
    phase0 = jax.random.uniform(k0, (n,), maxval=2 * jnp.pi)
    ts = jnp.arange(T) * jnp.pi  # half-cycle per timepoint
    theta = phase0[:, None] + ts[None, :]
    out = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return out + noise * jax.random.normal(k1, (n, T, 2))
