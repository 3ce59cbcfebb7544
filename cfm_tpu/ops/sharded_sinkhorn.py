"""Device-sharded log-domain Sinkhorn for large minibatch couplings.

The OT cost matrix is (n, m) — batch x batch. For global batches beyond a
few thousand, one device can't hold or quickly process it; this module
shards the ROWS of the cost matrix over the mesh's data axis with
``shard_map`` (SURVEY.md section 5: "the scaling axes to shard are batch and
the OT cost matrix"):

- each device holds its x0 shard and the full x1 (replicated), builds its
  (n/D, m) cost block with the MXU cost kernel, and never materializes the
  full matrix;
- the f-potential update (row logsumexp) is device-local;
- the g-potential update (column logsumexp over all rows) combines
  device-local partial logsumexps with a max/psum pair over ICI — a
  numerically stable distributed logsumexp.

The result is bitwise-equivalent (up to reduction order) to
``ops.sinkhorn.sinkhorn`` on the gathered batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp
from jax.sharding import Mesh, PartitionSpec as P

from .cost import sq_euclidean_cost


def _distributed_colwise_logsumexp(logits_block: jax.Array, axis_name: str) -> jax.Array:
    """logsumexp over the GLOBAL row axis of a row-sharded (n/D, m) block.

    Stable two-pass: global column max via pmax, then psum of shifted exps.
    """
    local_max = jnp.max(logits_block, axis=0)
    global_max = jax.lax.pmax(local_max, axis_name)
    shifted = jnp.exp(logits_block - global_max[None, :])
    total = jax.lax.psum(jnp.sum(shifted, axis=0), axis_name)
    return global_max + jnp.log(total)


def sharded_sinkhorn_plan(
    mesh: Mesh,
    x0: jax.Array,
    x1: jax.Array,
    reg: float,
    num_iters: int = 500,
    axis: str = "data",
):
    """Entropic OT plan for uniform marginals, rows sharded over ``axis``.

    Returns the plan with the SAME row sharding as x0 — downstream
    per-row sampling (conditional resampling of partners) can stay sharded;
    only gather it if you truly need the dense global plan.
    """
    n, m = x0.shape[0], x1.shape[0]
    loga = -jnp.log(float(n))
    logb = jnp.full((m,), -jnp.log(float(m)), jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def solve(x0_block, x1_full):
        M_block = sq_euclidean_cost(x0_block, x1_full) / reg  # (n/D, m)

        def body(carry, _):
            f_block, g = carry
            # f update: row logsumexp, local.
            f_block = loga - logsumexp(g[None, :] - M_block, axis=1)
            # g update: column logsumexp over ALL rows, distributed.
            col_lse = _distributed_colwise_logsumexp(
                f_block[:, None] - M_block, axis
            )
            g = logb - col_lse
            return (f_block, g), None

        f0 = jnp.zeros((x0_block.shape[0],), jnp.float32)
        g0 = jnp.zeros((m,), jnp.float32)
        (f_block, g), _ = jax.lax.scan(body, (f0, g0), None, length=num_iters)
        return jnp.exp(f_block[:, None] + g[None, :] - M_block)

    return solve(x0, x1)
