"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-device sharding tests run against spoofed host devices
(xla_force_host_platform_device_count), the TPU analogue of the reference's
ddp_sim 2-CPU-process testing mode (runner/configs/trainer/ddp_sim.yaml).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
