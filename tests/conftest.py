"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-device sharding tests run against spoofed host devices
(xla_force_host_platform_device_count), the TPU analogue of the reference's
ddp_sim 2-CPU-process testing mode (runner/configs/trainer/ddp_sim.yaml).
"""

import os

# CFM_TPU_HW=1 keeps the real TPU platform so the hardware-only tests
# (named *_on_tpu; they skip on CPU) run on the chip:
#   CFM_TPU_HW=1 python -m pytest tests/ -k on_tpu -q
_HW = os.environ.get("CFM_TPU_HW") == "1"

# Force-set (not setdefault): the shell may have JAX_PLATFORMS=axon pointing
# at a real tunneled TPU chip; unit tests must run on the spoofed CPU mesh.
if not _HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _HW and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (zero-egress TPU tunnel) registers its backend and
# programmatically sets jax_platforms="axon,cpu", overriding the env var — so
# re-pin the config to CPU after import.
import jax  # noqa: E402

if not _HW:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
