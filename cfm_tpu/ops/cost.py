"""Pairwise cost matrices, built MXU-first.

Replaces the reference's ``torch.cdist(x0, x1) ** 2`` host-bound cost
construction (/root/reference/torchcfm/optimal_transport.py:84-87). The
squared-Euclidean cost is computed as ||x||^2 + ||y||^2 - 2 x @ y.T so the
dominant term is a single large matmul that XLA tiles onto the MXU; the
elementwise correction fuses into it. Everything stays on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import flatten_batch


def sq_euclidean_cost(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Squared Euclidean cost matrix C[i, j] = ||x0_i - x1_j||^2.

    Accepts (bs, *dim) inputs; higher-rank inputs are flattened per-sample as in
    the reference (optimal_transport.py:81-84). Accumulates the cross term in
    float32 regardless of input dtype (bf16-safe on the MXU).
    """
    x0 = flatten_batch(x0)
    x1 = flatten_batch(x1)
    # Center both clouds by their pooled mean before the dot-form expansion:
    # pairwise distances are shift-invariant, but ||x||^2 is not — for clouds
    # far from the origin the uncentered form loses the O(d)-sized distances
    # to f32 cancellation against the O(|mu|^2 d) norms (the same failure
    # flash_sinkhorn._center guards; the reference's torch.cdist computes
    # differences directly and never sees it).
    mu = 0.5 * (
        jnp.mean(x0, axis=0, dtype=jnp.float32)
        + jnp.mean(x1, axis=0, dtype=jnp.float32)
    )
    x0 = (x0 - mu).astype(x0.dtype)  # keep the cross term on the bf16 MXU path
    x1 = (x1 - mu).astype(x1.dtype)
    sq0 = jnp.sum(jnp.square(x0.astype(jnp.float32)), axis=-1)
    sq1 = jnp.sum(jnp.square(x1.astype(jnp.float32)), axis=-1)
    cross = jax.lax.dot_general(
        x0,
        x1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cost = sq0[:, None] + sq1[None, :] - 2.0 * cross
    return jnp.maximum(cost, 0.0)


def euclidean_cost(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Euclidean cost matrix C[i, j] = ||x0_i - x1_j|| (W1 ground cost)."""
    return jnp.sqrt(sq_euclidean_cost(x0, x1) + 1e-30)
