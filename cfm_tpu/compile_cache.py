"""Persistent XLA compile cache setup.

On the axon TPU tunnel, first compiles of large programs (the UNet train
step) take many minutes via remote compile; the persistent cache makes every
subsequent process start instant. Call ``enable()`` early (Trainer and
bench.py do). Opt out with CFM_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("CFM_TPU_COMPILE_CACHE", "/tmp/jax_cache")
_enabled = False


def enable(cache_dir: str = _DEFAULT_DIR) -> None:
    global _enabled
    if _enabled or os.environ.get("CFM_TPU_NO_COMPILE_CACHE") == "1":
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _enabled = True
