"""Profiling and timing helpers.

TPU-native counterpart of the reference's minimal tracing surface
(SURVEY.md section 5: Lightning profiler configs, NFE counters, exec-time
file). Adds: jax profiler traces viewable in XProf/TensorBoard, and an
honest step timer for the axon tunnel (where ``block_until_ready`` can
return before device completion — a device->host scalar fetch is the only
reliable fence).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace") -> Iterator[None]:
    """Capture a jax profiler trace: `with trace("logs/trace"): step(...)`.

    View with `tensorboard --logdir logs/trace` (the reference's
    trainer.profiler analogue, runner/configs/debug/profiler.yaml).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def hard_sync(x) -> float:
    """Fence that provably waits for device completion: fetch one scalar.

    On the axon TPU tunnel ``block_until_ready`` acks asynchronously; a
    device->host transfer of a value cannot complete before the compute
    producing it, so this is the honest barrier for timing.
    """
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2,
            sync_overhead_s: float = 0.0) -> float:
    """Median-free simple timer: run ``iters`` dependent calls, one hard sync.

    Returns seconds per call. Subtract a measured ``sync_overhead_s`` (the
    tunnel round-trip, ~30 ms on axon) for microsecond-scale kernels.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    dt = time.perf_counter() - t0 - sync_overhead_s
    return max(dt, 0.0) / iters


def measure_sync_overhead(iters: int = 5) -> float:
    """Measure the fixed device->host fetch latency on this platform."""
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda a: a * 1.0)
    hard_sync(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        hard_sync(f(x))
    return (time.perf_counter() - t0) / iters
