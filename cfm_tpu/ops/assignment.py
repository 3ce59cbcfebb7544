"""Exact linear-assignment solvers for minibatch optimal transport.

The reference computes exact OT plans by shipping the cost matrix to the host
and running POT's C++ network simplex (/root/reference/torchcfm/
optimal_transport.py:49,87) or scipy's Hungarian algorithm (:179). That
per-batch device->host round-trip is the reference's main structural
bottleneck (SURVEY.md section 3.1).

Here the default solver is a fully vectorized Jacobi *auction algorithm*
(Bertsekas 1988) with epsilon-scaling. Each bidding round is dense [n, n]
vector work (row max / argmax / scatter) — exactly the shape of computation
the TPU VPU is built for — inside a ``lax.while_loop``, so the whole solve
stays on device and fuses into the jitted train step. For uniform marginals
over equal-sized batches (the only case the reference ever exercises), the
optimal transport plan is a permutation, so an assignment solve *is* the
exact OT solve.

A scipy Hungarian host-callback is provided as a correctness oracle and CPU
fallback (`solve_assignment(..., method="hungarian")`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Python float on purpose: a module-level jnp constant would initialize
# the XLA backend at import, breaking multihost jax.distributed init.
_NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("num_phases", "max_rounds"))
def auction_assignment(
    cost: jax.Array,
    *,
    num_phases: int = 12,
    eps_decay: float = 4.0,
    max_rounds: int = 0,
) -> jax.Array:
    """Solve min-cost perfect assignment on a square cost matrix, on device.

    Returns ``perm`` (n,) int32 with person i assigned to object ``perm[i]``.
    The result is within ``n * eps_final`` of the optimal cost where
    ``eps_final = cost_range / 2 / eps_decay**(num_phases - 1)`` — with the
    defaults, a relative gap below 1e-5 for n <= 4096, i.e. exact for every
    non-degenerate minibatch coupling.

    Structured as ONE flat ``lax.while_loop`` whose carry holds the current
    eps: when a phase converges (all persons assigned) the loop resets the
    assignment, keeps the learned prices (the eps-scaling warm start), and
    divides eps — rather than a scan-of-while-loops, which XLA:TPU compiles
    far more slowly. Each bidding round is dense [n, n] VPU work.
    """
    n = cost.shape[0]
    assert cost.shape == (n, n), "auction_assignment requires a square cost matrix"
    if n == 1:
        return jnp.zeros((1,), dtype=jnp.int32)
    benefit = -cost.astype(jnp.float32)
    cost_range = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-12)
    eps0 = cost_range / 2.0
    eps_final = eps0 / (eps_decay ** (num_phases - 1))
    if max_rounds <= 0:
        max_rounds = 200 * n + 20000

    obj_ids = jnp.arange(n, dtype=jnp.int32)
    unassigned_init = jnp.full((n,), -1, dtype=jnp.int32)

    def body(state):
        person_to_obj, obj_to_person, prices, eps, rounds = state
        unassigned = person_to_obj < 0
        # Bidding: every unassigned person finds its best and second-best value
        # (max + masked re-max: two fused VPU passes).
        values = benefit - prices[None, :]  # [n persons, n objects]
        best_j = jnp.argmax(values, axis=1).astype(jnp.int32)
        best_v = jnp.max(values, axis=1)
        masked = jnp.where(obj_ids[None, :] == best_j[:, None], _NEG_INF, values)
        second_v = jnp.max(masked, axis=1)
        bids = jnp.take(prices, best_j) + (best_v - second_v) + eps

        # Assignment: each object accepts the highest bid among unassigned bidders.
        bid_matrix = jnp.where(
            unassigned[:, None] & (obj_ids[None, :] == best_j[:, None]),
            bids[:, None],
            _NEG_INF,
        )
        win_bid = jnp.max(bid_matrix, axis=0)
        winner = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)
        has_bid = win_bid > _NEG_INF

        prices = jnp.where(has_bid, win_bid, prices)
        # Previous owners of re-auctioned objects become unassigned.
        prev_owner = obj_to_person
        drop_idx = jnp.where(has_bid & (prev_owner >= 0), prev_owner, n)
        person_to_obj = person_to_obj.at[drop_idx].set(-1, mode="drop")
        # Winners take their objects.
        winner_idx = jnp.where(has_bid, winner, n)
        person_to_obj = person_to_obj.at[winner_idx].set(obj_ids, mode="drop")
        obj_to_person = jnp.where(has_bid, winner, obj_to_person)

        # Phase transition: converged at this eps but not yet at eps_final ->
        # decay eps, reset the assignment, keep prices (warm start).
        done_phase = jnp.all(person_to_obj >= 0)
        advance = jnp.logical_and(done_phase, eps > eps_final)
        person_to_obj = jnp.where(advance, unassigned_init, person_to_obj)
        obj_to_person = jnp.where(advance, unassigned_init, obj_to_person)
        eps = jnp.where(advance, eps / eps_decay, eps)
        return person_to_obj, obj_to_person, prices, eps, rounds + 1

    def not_done(state):
        person_to_obj, _, _, _, rounds = state
        return jnp.logical_and(
            jnp.any(person_to_obj < 0), rounds < max_rounds
        )

    init = (
        unassigned_init,
        unassigned_init,
        jnp.zeros((n,), jnp.float32),
        eps0,
        jnp.zeros((), jnp.int32),
    )
    person_to_obj, obj_to_person, _, _, _ = jax.lax.while_loop(not_done, body, init)
    return _complete_assignment(person_to_obj, obj_to_person)


def _complete_assignment(person_to_obj: jax.Array, obj_to_person: jax.Array) -> jax.Array:
    """Round-cap safety net: turn a partial matching into a permutation.

    A solve that exhausts ``max_rounds`` leaves ``-1`` sentinels which
    downstream gathers would silently WRAP (``x1[perm]`` reads the last row,
    ``_plan_from_perm`` scatters into the last column) — a corrupt coupling
    with no error. Pair the k-th unassigned person with the k-th unowned
    object instead: always a valid permutation, near-optimal because prices
    are converged, and the identity map when the solve finished normally
    (the common case — every row assigned, this is a no-op).
    """
    n = person_to_obj.shape[0]
    obj_ids = jnp.arange(n, dtype=jnp.int32)
    unassigned = person_to_obj < 0
    unowned = obj_to_person < 0
    person_rank = jnp.cumsum(unassigned) - 1  # rank of person i among unassigned
    obj_rank = jnp.cumsum(unowned) - 1  # rank of object j among unowned
    fill = (
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(unowned, obj_rank, n)]
        .set(obj_ids, mode="drop")
    )
    return jnp.where(
        unassigned, fill[jnp.clip(person_rank, 0, n - 1)], person_to_obj
    )


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    from .native import lap_solve

    col, _ = lap_solve(np.asarray(cost, np.float64))
    return col.astype(np.int32)


def hungarian_assignment(cost: jax.Array) -> jax.Array:
    """Exact assignment via scipy's Hungarian algorithm on the host.

    Correctness oracle mirroring the reference's order-preserving path
    (optimal_transport.py:179). Incurs a device->host sync; prefer
    :func:`auction_assignment` inside jitted training steps. On concrete
    (non-traced) inputs the solve runs directly on host numpy — some TPU
    runtimes (axon) do not support host callbacks at all.
    """
    n = cost.shape[0]
    if not isinstance(cost, jax.core.Tracer):
        return jnp.asarray(_lsa_host(np.asarray(cost)))
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((n,), jnp.int32),
        cost,
        vmap_method="sequential",
    )


def resolve_solver(method: str = "auto", n: int = 0) -> str:
    """Resolve "auto" to the right backend for the current platform.

    TPU: the in-VMEM Pallas auction kernel (ops/pallas_auction.py — the cost
    matrix and assignment state stay VMEM-resident for the whole solve;
    ~0.3 ms at n=128 vs ~15 ms for the XLA while_loop auction), falling back
    to the XLA auction above the VMEM size cutoff. CPU: the native C++ JV
    solver via callback — a 256-point solve is ~1 ms on host vs ~1 s of
    while_loop dispatch overhead for the auction on XLA:CPU. (axon TPU
    runtimes don't support host callbacks at all, so the TPU path must stay
    on-device.)
    """
    if method != "auto":
        return method
    backend = jax.default_backend()
    if backend == "cpu":
        return "hungarian"
    # The dense in-VMEM kernel holds ~4 (n, n) f32 temporaries; n=1024
    # exceeds the 16 MB VMEM (measured), n<=512 fits with headroom (4.7 ms
    # at n=512). Above that, the row-tiled kernel with compact (1, n) state
    # takes over: VMEM-resident benefit at n<=1024 (61 ms measured),
    # HBM-streamed row tiles to n=4096 (456 ms at n=2048) — exact vs the
    # native JV solver at all sizes.
    if backend in ("tpu", "axon"):
        if 0 < n <= 512:
            return "pallas"
        if n <= 4096 and n % (128 if n >= 4096 else 256) == 0:
            return "pallas_tiled"
    return "auction"


def solve_assignment(cost: jax.Array, method: str = "auto") -> jax.Array:
    """Dispatch: "auto" | "pallas" | "auction" | "hungarian"."""
    method = resolve_solver(method, n=cost.shape[0])
    if method == "pallas":
        from .pallas_auction import pallas_auction_assignment

        return pallas_auction_assignment(cost)
    if method == "pallas_tiled":
        from .pallas_auction import pallas_auction_assignment_tiled

        return pallas_auction_assignment_tiled(cost)
    if method == "auction":
        return auction_assignment(cost)
    if method == "hungarian":
        return hungarian_assignment(cost)
    raise ValueError(f"Unknown assignment method: {method}")


def assignment_cost(cost: jax.Array, perm: jax.Array) -> jax.Array:
    """Total cost of an assignment (sum over i of cost[i, perm[i]])."""
    return jnp.sum(jnp.take_along_axis(cost, perm[:, None], axis=1))
