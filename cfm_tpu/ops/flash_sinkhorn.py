"""Flash Sinkhorn: IO-aware entropic OT that never materializes the cost.

The log-domain Sinkhorn in ops/sinkhorn.py takes a dense (n, m) cost matrix
— at n = 16k that is a 1 GB HBM tensor written once and re-read every
iteration. Following the IO-aware formulation (FlashSinkhorn,
arxiv 2602.03067 — flash-attention-style tiling applied to entropic OT),
this kernel computes squared-Euclidean cost TILES on the MXU inside the
update loop (c_ij = |x_i|^2 + |y_j|^2 - 2 x_i.y_j) and reduces them with an
online (streaming max/sum) logsumexp, so HBM holds only the point clouds
and the potentials:

    HBM traffic per iteration:  O(nd + md)   instead of  O(nm)
    VMEM residency:             x (n,d), y (m,d), f (n,1), g (1,m)

Same update order and semantics as ops/sinkhorn.sinkhorn (f from g, g from
new f, row-marginal error from the implied plan), so potentials agree with
the materialized solver to f32 tolerance — pinned by tests against it.

Layout: f lives as a COLUMN (n, 1) and g as a ROW (1, m); both updates
tile BOTH axes, reducing (Ti, Tj) cost blocks along the relevant axis, so
VMEM stays bounded at O(Ti*Tj) for any n, m (an (n, Tj) temporary alone
would be 16 MB at n = 8192 — measured scoped-vmem OOM). No transposes,
which Mosaic would reject for 1-wide vectors.

Downstream consumers never need the dense plan either:
- :func:`plan_sample_from_potentials` draws j ~ pi(. | i) for every row by
  Gumbel-max over chunked logits (coupling resampling, OTPlanSampler role);
- :func:`transport_cost_from_potentials` accumulates <pi, C> in chunks
  (wasserstein role).
Both are plain XLA over (chunk, m) blocks — O(chunk * m) live memory.

Reference use: torchcfm/optimal_transport.py:51 couples minibatches with
``pot.sinkhorn`` on a materialized host cost matrix; this keeps arbitrary-
size couplings on device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38

# Test hook (as in pallas_attention): run the kernel in interpret mode so
# CPU CI pins the kernel math itself, not just the XLA fallback.
INTERPRET = False


def _flash_kernel(x_ref, y_ref, sqx_ref, sqy_ref, loga_ref, logb_ref,
                  scal_ref, f_ref, g_ref, *, n, m, tile_j, tile_i,
                  num_iters):
    reg = scal_ref[0]
    tol = scal_ref[1]
    nj = m // tile_j
    ni = n // tile_i

    f_ref[:] = jnp.zeros((n, 1), jnp.float32)
    g_ref[:] = jnp.zeros((1, m), jnp.float32)

    # Mosaic has no dynamic_slice on VALUES — all tile loads slice REFS via
    # pl.ds, and the lse helpers read the potentials back from their refs.
    # Both passes tile BOTH axes ((Ti, Tj) blocks), so VMEM stays bounded
    # at O(Ti*Tj) however large n and m get (an (n, Tj) temporary alone is
    # 16 MB at n = 8192).

    def cost_block(ti, tj):
        xs = x_ref[pl.ds(ti * tile_i, tile_i), :]
        ys = y_ref[pl.ds(tj * tile_j, tile_j), :]
        dots = jax.lax.dot_general(                # (Ti, Tj) on the MXU
            xs, ys, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sx = sqx_ref[pl.ds(ti * tile_i, tile_i), :]
        sy = sqy_ref[:, pl.ds(tj * tile_j, tile_j)]
        return sx + sy - 2.0 * dots

    def row_lse_block(ti):
        """Online LSE_j((g_j - c_ij)/reg) for row block ti -> (Ti, 1)."""
        def jtile(tj, carry):
            run_m, run_s = carry                   # (Ti, 1) each
            gs = g_ref[:, pl.ds(tj * tile_j, tile_j)]
            z = (gs - cost_block(ti, tj)) / reg
            tm = jnp.max(z, axis=1, keepdims=True)
            nm = jnp.maximum(run_m, tm)
            run_s = run_s * jnp.exp(run_m - nm) + jnp.sum(
                jnp.exp(z - nm), axis=1, keepdims=True)
            return nm, run_s

        m0 = jnp.full((tile_i, 1), _NEG, jnp.float32)
        s0 = jnp.zeros((tile_i, 1), jnp.float32)
        rm, rs = jax.lax.fori_loop(0, nj, jtile, (m0, s0))
        return rm + jnp.log(rs)

    def col_lse_block(tj):
        """Online LSE_i((f_i - c_ij)/reg) for col block tj -> (1, Tj)."""
        def itile(ti, carry):
            run_m, run_s = carry                   # (1, Tj) each
            fs = f_ref[pl.ds(ti * tile_i, tile_i), :]
            z = (fs - cost_block(ti, tj)) / reg
            tm = jnp.max(z, axis=0, keepdims=True)
            nm = jnp.maximum(run_m, tm)
            run_s = run_s * jnp.exp(run_m - nm) + jnp.sum(
                jnp.exp(z - nm), axis=0, keepdims=True)
            return nm, run_s

        m0 = jnp.full((1, tile_j), _NEG, jnp.float32)
        s0 = jnp.zeros((1, tile_j), jnp.float32)
        rm, rs = jax.lax.fori_loop(0, ni, itile, (m0, s0))
        return rm + jnp.log(rs)

    def body(state):
        _, it = state

        def f_block(ti, _):
            loga_b = loga_ref[pl.ds(ti * tile_i, tile_i), :]
            f_ref[pl.ds(ti * tile_i, tile_i), :] = reg * (
                loga_b - row_lse_block(ti))
            return 0

        jax.lax.fori_loop(0, ni, f_block, 0)       # f from old g

        def g_block(tj, _):
            logb_b = logb_ref[:, pl.ds(tj * tile_j, tile_j)]
            g_ref[:, pl.ds(tj * tile_j, tile_j)] = reg * (
                logb_b - col_lse_block(tj))
            return 0

        jax.lax.fori_loop(0, nj, g_block, 0)       # g from new f

        # Row-marginal error of the implied plan (reference semantics).
        def err_block(ti, acc):
            lse = row_lse_block(ti) + f_ref[pl.ds(ti * tile_i, tile_i), :] / reg
            loga_b = loga_ref[pl.ds(ti * tile_i, tile_i), :]
            return acc + jnp.sum(jnp.abs(jnp.exp(lse) - jnp.exp(loga_b)))

        err = jax.lax.fori_loop(0, ni, err_block, jnp.zeros((), jnp.float32))
        return err, it + 1

    def cond(state):
        err, it = state
        return jnp.logical_and(err > tol, it < num_iters)

    jax.lax.while_loop(cond, body, (jnp.asarray(jnp.inf, jnp.float32),
                                    jnp.zeros((), jnp.int32)))


def _pick_tile(size: int, target: int) -> int:
    t = min(size, target)
    while size % t:
        t -= 1
    return max(t, 1)


def _pick_aligned_tile(size: int, target: int, align: int) -> Optional[int]:
    """Largest divisor of ``size`` that is <= target and a multiple of
    ``align`` (Mosaic dynamic slices must be tile-aligned: 8 on the sublane
    dim, 128 on the lane dim). ``size`` itself is legal regardless of
    alignment (a full-axis slice at offset 0). None if nothing fits."""
    if size <= target:
        return size
    t = (target // align) * align
    while t >= align:
        if size % t == 0:
            return t
        t -= align
    return None


def _pallas_tiles(n: int, m: int) -> Optional[Tuple[int, int]]:
    tile_i = _pick_aligned_tile(n, 512, 8)      # sublane-dim slices of f/x
    tile_j = _pick_aligned_tile(m, 512, 128)    # lane-dim slices of g/sqy
    if tile_i is None or tile_j is None:
        return None
    return tile_i, tile_j


# The kernel holds x, y, the potentials and (tile_i, tile_j) temporaries in
# VMEM; cap the point-cloud residency well under the ~16 MB scoped limit.
_VMEM_POINT_BUDGET_BYTES = 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("num_iters", "tol"))
def _flash_sinkhorn_pallas(x, y, loga, logb, reg, num_iters, tol):
    n, d = x.shape
    m = y.shape[0]
    del d
    tiles = _pallas_tiles(n, m)
    assert tiles is not None, "caller must gate on flash_kernel_supported"
    tile_i, tile_j = tiles
    sqx = jnp.sum(jnp.square(x), axis=1, keepdims=True)        # (n, 1)
    sqy = jnp.sum(jnp.square(y), axis=1, keepdims=True).T      # (1, m)
    scal = jnp.stack([jnp.asarray(reg, jnp.float32),
                      jnp.asarray(tol, jnp.float32)])
    kern = functools.partial(
        _flash_kernel, n=n, m=m, tile_j=tile_j, tile_i=tile_i,
        num_iters=num_iters)
    f, g = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, m), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        interpret=INTERPRET,
    )(x.astype(jnp.float32), y.astype(jnp.float32), sqx, sqy,
      loga.reshape(n, 1).astype(jnp.float32),
      logb.reshape(1, m).astype(jnp.float32), scal)
    return f[:, 0], g[0]


def _flash_sinkhorn_xla(x, y, loga, logb, reg, num_iters, tol):
    """Identical math with a materialized cost (CPU fallback + test oracle):
    builds the dense (pre-centered) cost and delegates the fixed-point loop
    to the ONE shared implementation in ops/sinkhorn.sinkhorn_potentials."""
    from .sinkhorn import sinkhorn_potentials

    M = (jnp.sum(jnp.square(x), 1)[:, None] + jnp.sum(jnp.square(y), 1)[None, :]
         - 2.0 * x.astype(jnp.float32) @ y.astype(jnp.float32).T)
    return sinkhorn_potentials(loga, logb, M, reg, num_iters=num_iters, tol=tol)


def sinkhorn_from_points(
    x: jax.Array,
    y: jax.Array,
    reg: float,
    a: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    num_iters: int = 1000,
    tol: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """Entropic-OT potentials (f, g) for squared-Euclidean cost, direct from
    the point clouds. On TPU: the flash Pallas kernel, O(nd + md) HBM per
    iteration; elsewhere: the materialized-cost twin. The dense plan is
    pi_ij = exp((f_i + g_j - c_ij) / reg) — use the chunked consumers below
    instead of materializing it."""
    n, m = x.shape[0], y.shape[0]
    loga = jnp.log((jnp.full((n,), 1.0 / n) if a is None else a).astype(jnp.float32))
    logb = jnp.log((jnp.full((m,), 1.0 / m) if b is None else b).astype(jnp.float32))
    x2, y2 = _center(x.reshape(n, -1), y.reshape(m, -1))
    impl = (_flash_sinkhorn_pallas
            if flash_kernel_supported(n, m, x2.shape[1])
            else _flash_sinkhorn_xla)
    return impl(x2, y2, loga, logb, reg, num_iters, tol)


def flash_kernel_supported(n: int, m: int, d: int) -> bool:
    """True when the Pallas kernel can run: a TPU backend, tile-aligned
    slice sizes available, and the VMEM-resident point clouds within budget
    (high-dimensional clouds like flattened CIFAR batches overflow the
    ~16 MB scoped VMEM — those fall back to the materialized XLA twin)."""
    if not (INTERPRET or jax.default_backend() in ("tpu", "axon")):
        return False
    if _pallas_tiles(n, m) is None:
        return False
    return 4 * d * (n + m) <= _VMEM_POINT_BUDGET_BYTES


def _center(x2, y2):
    """Remove the joint mean: squared-Euclidean cost is translation-
    invariant, and the dot-form c = |x|^2+|y|^2-2xy loses f32 precision
    (catastrophic cancellation) when the clouds sit far from the origin."""
    mu = 0.5 * (jnp.mean(x2, axis=0) + jnp.mean(y2, axis=0))
    return (x2 - mu).astype(jnp.float32), (y2 - mu).astype(jnp.float32)


def _cost_chunk(xc, y, sqy):
    return (jnp.sum(jnp.square(xc), 1)[:, None] + sqy[None, :]
            - 2.0 * xc @ y.T)


def plan_sample_from_potentials(
    key: jax.Array, x: jax.Array, y: jax.Array,
    f: jax.Array, g: jax.Array, reg: float, chunk: int = 1024,
) -> jax.Array:
    """For every row i draw j ~ pi(. | i) by Gumbel-max over the row logits
    (g_j - c_ij)/reg, chunked so no (n, m) tensor is ever live. Returns
    (n,) int32 column indices — the coupling resample, cf.
    OTPlanSampler.sample_map with one draw per row."""
    n = x.shape[0]
    del f  # Gumbel-max over a row is invariant to the row-constant f_i
    x2, y2 = _center(x.reshape(n, -1), y.reshape(y.shape[0], -1))
    sqy = jnp.sum(jnp.square(y2), axis=1)
    chunk = _pick_tile(n, chunk)
    keys = jax.random.split(key, n // chunk)

    def one(args):
        k, xc = args
        logits = (g[None, :] - _cost_chunk(xc, y2, sqy)) / reg
        gum = jax.random.gumbel(k, logits.shape)
        return jnp.argmax(logits + gum, axis=1).astype(jnp.int32)

    idx = jax.lax.map(one, (keys, x2.reshape(-1, chunk, x2.shape[1])))
    return idx.reshape(n)


def row_marginal_error_from_potentials(
    x: jax.Array, y: jax.Array, f: jax.Array, g: jax.Array, reg: float,
    a: Optional[jax.Array] = None, chunk: int = 1024,
) -> jax.Array:
    """Max relative row-marginal error of the implied plan — a cheap
    convergence certificate for a finished solve. One extra chunked pass
    (~one sinkhorn iteration of compute, no (n, m) tensor): an unconverged
    or underflowed solve whose potentials are still finite shows up here as
    rows whose mass is far from a_i, which the finite-potential guard alone
    cannot see."""
    n = x.shape[0]
    a_vec = (jnp.full((n,), 1.0 / n) if a is None else a).astype(jnp.float32)
    x2, y2 = _center(x.reshape(n, -1), y.reshape(y.shape[0], -1))
    sqy = jnp.sum(jnp.square(y2), axis=1)
    chunk = _pick_tile(n, chunk)

    def one(args):
        xc, fc, ac = args
        c = _cost_chunk(xc, y2, sqy)
        row = jnp.sum(jnp.exp((fc[:, None] + g[None, :] - c) / reg), axis=1)
        return jnp.max(jnp.abs(row - ac) / jnp.maximum(ac, 1e-30))

    parts = jax.lax.map(one, (x2.reshape(-1, chunk, x2.shape[1]),
                              f.reshape(-1, chunk),
                              a_vec.reshape(-1, chunk)))
    return jnp.max(parts)


def transport_cost_from_potentials(
    x: jax.Array, y: jax.Array, f: jax.Array, g: jax.Array, reg: float,
    chunk: int = 1024,
) -> jax.Array:
    """<pi, C> accumulated in row chunks (the ``pot.sinkhorn2`` value) —
    no dense plan or cost in memory. Marginals are already encoded in the
    potentials (via loga/logb in the solve), so none are taken here."""
    n = x.shape[0]
    x2, y2 = _center(x.reshape(n, -1), y.reshape(y.shape[0], -1))
    sqy = jnp.sum(jnp.square(y2), axis=1)
    chunk = _pick_tile(n, chunk)

    def one(args):
        xc, fc = args
        c = _cost_chunk(xc, y2, sqy)
        pi = jnp.exp((fc[:, None] + g[None, :] - c) / reg)
        return jnp.sum(pi * c)

    parts = jax.lax.map(one, (x2.reshape(-1, chunk, x2.shape[1]),
                              f.reshape(-1, chunk)))
    return jnp.sum(parts)
