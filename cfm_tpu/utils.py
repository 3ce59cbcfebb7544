"""Small shared utilities.

TPU-native counterpart of the broadcasting helper at
/root/reference/torchcfm/conditional_flow_matching.py:17-38 plus pytree helpers
used across the framework (EMA, parameter counting).
"""

from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Scalar = Union[float, int]


def pad_t_like_x(t: Union[Array, Scalar], x: Array) -> Union[Array, Scalar]:
    """Reshape the time vector ``t`` (bs,) so it broadcasts against ``x`` (bs, *dim).

    Python scalars pass through unchanged (they broadcast natively), mirroring the
    reference semantics (conditional_flow_matching.py:36-38).
    """
    if isinstance(t, (float, int)):
        return t
    t = jnp.asarray(t)
    return t.reshape(-1, *([1] * (x.ndim - 1)))


def ema_update(ema_params: Any, new_params: Any, decay: float) -> Any:
    """Exponential moving average over a parameter pytree.

    ema <- decay * ema + (1 - decay) * new  (reference: examples/images/cifar10/
    utils_cifar.py:76-82 does the same per-tensor lerp).
    """
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params)


def count_params(params: Any) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))


def param_summary(params: Any, max_depth: int = 1) -> str:
    """Per-module parameter-count table (the reference's RichModelSummary
    callback role, runner/configs/callbacks/model_summary.yaml: max_depth 1).

    Groups pytree leaves by the first ``max_depth`` path components and
    returns an aligned text table ending with the total.
    """
    groups: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = []
        for p in path[:max_depth]:
            keys.append(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p))))
        name = "/".join(str(k) for k in keys) or "(root)"
        groups[name] = groups.get(name, 0) + int(jnp.size(leaf))
    width = max(len(n) for n in groups) if groups else 6
    lines = [f"{name:<{width}}  {cnt:>12,}" for name, cnt in sorted(groups.items())]
    total = sum(groups.values())
    lines.append(f"{'TOTAL':<{width}}  {total:>12,}")
    return "\n".join(lines)


def flatten_batch(x: Array) -> Array:
    """Flatten (bs, *dim) -> (bs, prod(dim)). No-op on 2-D inputs."""
    if x.ndim > 2:
        return x.reshape(x.shape[0], -1)
    if x.ndim == 1:
        return x[:, None]
    return x


def mean_flat(x: Array) -> Array:
    """Mean over all non-batch dimensions (reference torchcfm/models/unet/
    nn.py ``mean_flat``)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))
