"""Benchmark: OT-CFM CIFAR-10 training throughput on one TPU chip.

Runs the reference's headline recipe — UNet 128ch (1,2,2,2), heads 4/64,
attention@16, batch 128, exact minibatch-OT coupling
(/root/reference/examples/images/cifar10/train_cifar10.py:93-151) — as the
framework's single fused XLA step (coupling + path sample + fwd/bwd + Adam +
EMA all on device) and reports steps/s.

Prints ONE JSON line:
  {"metric": "otcfm_cifar10_train_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N}

vs_baseline compares against 4.3 steps/s — an estimated A100 fp32 throughput
for the same torch recipe (the repo publishes no wall-clock numbers; this
estimate anchors the driver's ">=3x A100" north-star ratio; see BASELINE.md).
"""

from __future__ import annotations

import json
import time

A100_BASELINE_STEPS_PER_S = 4.3


def main(smoke: bool = False) -> None:
    import jax

    # Persistent compile cache: the full train-step program takes minutes to
    # build over the axon remote-compile tunnel; cache it across processes.
    from cfm_tpu.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    import jax.numpy as jnp

    from cfm_tpu import ExactOptimalTransportConditionalFlowMatcher
    from cfm_tpu.models import UNetModelWrapper
    from cfm_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    batch = 32 if smoke else 128
    model = UNetModelWrapper(
        dim=(32, 32, 3),
        num_channels=32 if smoke else 128,
        channel_mult=(1, 2) if smoke else (1, 2, 2, 2),
        num_res_blocks=1 if smoke else 2,
        num_heads=4,
        num_head_channels=-1 if smoke else 64,
        attention_resolutions="16",
        dropout=0.1,
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((2,)), jnp.zeros((2, 32, 32, 3)))

    matcher = ExactOptimalTransportConditionalFlowMatcher(sigma=0.0)
    optimizer = make_optimizer(lr=2e-4, warmup_steps=5000, grad_clip=1.0)
    state = init_train_state(params, optimizer)
    # train_mode=False: dropout masks are FLOP-free noise for a throughput
    # benchmark, and keeping the program identical across runs lets the
    # persistent compile cache absorb the ~10 min axon remote compile.
    step = jax.jit(
        make_train_step(matcher, model.apply, optimizer, ema_decay=0.9999),
        donate_argnums=(0,),
    )

    def batch_pair(k):
        k0, k1 = jax.random.split(k)
        x0 = jax.random.normal(k0, (batch, 32, 32, 3))
        x1 = jax.random.normal(k1, (batch, 32, 32, 3))
        return x0, x1

    # Warmup: compile + 3 steps. NOTE: on the axon tunnel block_until_ready
    # returns before device completion, so every timing fence below is a
    # host fetch of the loss scalar (a device->host transfer cannot complete
    # before the compute producing it).
    key, k = jax.random.split(key)
    x0, x1 = batch_pair(k)
    for _ in range(3):
        key, ks = jax.random.split(key)
        state, metrics = step(state, ks, x0, x1)
    float(metrics["loss"])

    n_steps = 10 if smoke else 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, ks = jax.random.split(key)
        state, metrics = step(state, ks, x0, x1)
    loss = float(metrics["loss"])  # hard sync
    dt = time.perf_counter() - t0
    assert loss == loss, "non-finite loss"

    steps_per_s = n_steps / dt
    print(
        json.dumps(
            {
                "metric": "otcfm_cifar10_train_steps_per_s",
                "value": round(steps_per_s, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / A100_BASELINE_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    import sys

    main(smoke="--smoke" in sys.argv)
