"""Device meshes, multihost initialization, and sharded input helpers.

TPU-native replacement for the reference's torch.distributed/NCCL stack
(SURVEY.md section 5 "Distributed communication backend";
/root/reference/examples/images/cifar10/utils_cifar.py:15-39 ``setup``,
train_cifar10_ddp.py:62-215): one SPMD program over a ``jax.sharding.Mesh``
instead of one process per GPU with ring all-reduce.

- ``initialize_distributed`` = the MASTER_ADDR/RANK handshake analogue
  (``jax.distributed.initialize``), no-op on single-host.
- ``make_mesh`` builds a ("data",) — or ("data", "model") — mesh over ICI;
  on multi-slice deployments put "data" on DCN and in-slice axes on ICI by
  ordering axes slowest-varying-first.
- Gradient reduction is *implicit*: under jit with batch-sharded inputs and
  replicated params, XLA inserts the psum over ICI where DDP ran NCCL
  all-reduce (train_cifar10_ddp.py:124-125).
- ``shard_batch_per_host`` replaces DistributedSampler: each host feeds its
  local shard; ``jax.make_array_from_process_local_data`` assembles the
  global array.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multihost init. Reads JAX_COORDINATOR_ADDRESS / defaults from env;
    no-op when single-process (the reference's dist.init_process_group
    analogue, utils_cifar.py:15-39).

    IMPORTANT: must run before ANY backend-touching JAX call — so the
    already-initialized guard checks the distributed client directly; a
    ``jax.process_count()`` guard would itself initialize the backend and
    make distributed init impossible (the round-1 bug this replaces,
    caught by tests/test_multihost.py)."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return  # single host
    # Already-initialized guard without touching the backend. Prefer the
    # public accessor; fall back to the private client handle on JAX
    # versions that lack it, and to attempting initialize() if both vanish.
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:
        try:
            from jax._src import distributed as _dist

            if _dist.global_state.client is not None:
                return
        except (ImportError, AttributeError):
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    except RuntimeError as e:  # double-init race when guards were unavailable
        if "already initialized" not in str(e).lower():
            raise


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over all devices. Default: 1-D data-parallel mesh.

    For ("data", "model") pass axis_sizes (e.g. (2, 4) on 8 chips): "data"
    varies slowest so on multi-slice topologies it maps to DCN and "model"
    stays on ICI.
    """
    devs = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devs)] + [1] * (len(axis_names) - 1)
    arr = np.array(devs).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def data_parallel_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis))


def shard_batch_per_host(mesh: Mesh, local_batch: np.ndarray, axis: str = "data"):
    """Assemble a globally batch-sharded array from per-host local data.

    Single-host: a plain device_put with the batch sharding. Multihost: each
    process contributes its local shard (the DistributedSampler replacement —
    hosts read disjoint data, no gather ever happens).
    """
    sharding = data_parallel_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    global_shape = (local_batch.shape[0] * jax.process_count(),) + local_batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_batch, global_shape)


def local_coupling_step(train_step, mesh: Mesh, axis: str = "data"):
    """Wrap a train step in shard_map so the OT coupling runs PER-SHARD.

    Under plain jit, the exact-OT coupling needs the global cost matrix, so
    XLA all-gathers the batch and replicates the solve. This wrapper instead
    couples within each device's local sub-batch — the reference DDP's
    semantics exactly (each rank couples its local minibatch,
    train_cifar10_ddp.py:156-171). Trades coupling quality for zero gather
    traffic; at global batch 128 on 8 chips each shard couples 16 samples.

    The gradient reduction lives INSIDE the wrapped step: ``train_step``
    MUST be built with ``make_train_step(..., data_axis=axis)`` (that is
    what inserts the pmean) — this wrapper only shards batches and
    decorrelates keys, and rejects a step tagged with a different (or no)
    data_axis rather than letting per-device params silently diverge.
    """
    from jax import shard_map

    tagged = getattr(train_step, "_data_axis", "<untagged>")
    if tagged != axis:
        raise ValueError(
            f"local_coupling_step(axis={axis!r}) needs a step built with "
            f"make_train_step(..., data_axis={axis!r}); got data_axis="
            f"{tagged!r} — without the in-step pmean every shard would "
            "apply only its local gradients and params would drift apart"
        )

    P = PartitionSpec

    def sharded(state, key, x0, x1):
        # Per-device sub-batch; different key per shard.
        idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, idx)
        return train_step(state, key, x0, x1)

    return shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
