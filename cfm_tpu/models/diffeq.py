"""Time-conditioned layers for CNF/FFJORD-style ODE functions.

TPU-native counterpart of the reference's diffeq layer zoo
(/root/reference/runner/src/models/components/layers/diffeq_layers/*.py and
layers/odefunc.py:13-258 ``ODEnet``): the standard conditioning schemes for
injecting scalar time into a linear layer — concat, concat-squash (FiLM-like
gating), hyper (time-generated weights), blend — plus an ``ODEnet`` stack
that composes them. All flax modules with signature ``(t, x) -> out``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_NONLINEARITIES = {
    "tanh": jnp.tanh,
    "relu": nn.relu,
    "softplus": nn.softplus,
    "elu": nn.elu,
    "swish": nn.silu,
    "square": jnp.square,
    "identity": lambda x: x,
}


def _t_col(t, x: Array) -> Array:
    """Broadcast scalar/batch time to a (bs, 1) column."""
    t = jnp.asarray(t, x.dtype).reshape(-1)
    if t.shape[0] == 1:
        t = jnp.broadcast_to(t, (x.shape[0],))
    return t[:, None]


class IgnoreLinear(nn.Module):
    """Plain linear, time ignored (diffeq_layers basic.py IgnoreLinear)."""

    out_dim: int

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        return nn.Dense(self.out_dim)(x)


class ConcatLinear(nn.Module):
    """Linear over [x, t] (ConcatLinear)."""

    out_dim: int

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        return nn.Dense(self.out_dim)(jnp.concatenate([x, _t_col(t, x)], axis=-1))


class ConcatLinear_v2(nn.Module):
    """Linear(x) + bias(t) (ConcatLinear_v2: a separate time bias path)."""

    out_dim: int

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        return nn.Dense(self.out_dim)(x) + nn.Dense(self.out_dim, use_bias=False)(_t_col(t, x))


class SquashLinear(nn.Module):
    """Linear(x) * sigmoid(gate(t)) (SquashLinear)."""

    out_dim: int

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        return nn.Dense(self.out_dim)(x) * jax.nn.sigmoid(
            nn.Dense(self.out_dim)(_t_col(t, x))
        )


class ConcatSquashLinear(nn.Module):
    """Linear(x) * sigmoid(gate(t)) + bias(t) — the FFJORD default
    (ConcatSquashLinear)."""

    out_dim: int

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        tc = _t_col(t, x)
        return nn.Dense(self.out_dim)(x) * jax.nn.sigmoid(
            nn.Dense(self.out_dim)(tc)
        ) + nn.Dense(self.out_dim, use_bias=False)(tc)


class HyperLinear(nn.Module):
    """Weights generated from t by a hypernetwork (HyperLinear)."""

    out_dim: int
    hyper_hidden: int = 32

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        d = x.shape[-1]
        h = nn.tanh(nn.Dense(self.hyper_hidden)(_t_col(t, x)))
        wb = nn.Dense(d * self.out_dim + self.out_dim)(h)  # (bs, d*out+out)
        w = wb[:, : d * self.out_dim].reshape(-1, d, self.out_dim)
        b = wb[:, d * self.out_dim :]
        return jnp.einsum("nd,ndo->no", x, w) + b


class BlendLinear(nn.Module):
    """(1-t) W0 x + t W1 x — linear blend of two layers (BlendLinear)."""

    out_dim: int

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        tc = _t_col(t, x)
        y0 = nn.Dense(self.out_dim)(x)
        y1 = nn.Dense(self.out_dim)(x)
        return y0 + tc * (y1 - y0)


_LAYER_TYPES = {
    "ignore": IgnoreLinear,
    "concat": ConcatLinear,
    "concat_v2": ConcatLinear_v2,
    "squash": SquashLinear,
    "concatsquash": ConcatSquashLinear,
    "hyper": HyperLinear,
    "blend": BlendLinear,
}


class ODEnet(nn.Module):
    """Stack of time-conditioned layers with a nonlinearity between
    (reference layers/odefunc.py ``ODEnet``): the standard CNF drift net.
    """

    hidden_dims: Sequence[int]
    out_dim: int
    layer_type: str = "concatsquash"
    nonlinearity: str = "tanh"

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        layer_cls = _LAYER_TYPES[self.layer_type]
        act = _NONLINEARITIES[self.nonlinearity]
        h = x
        for width in self.hidden_dims:
            h = act(layer_cls(out_dim=width)(t, h))
        return layer_cls(out_dim=self.out_dim)(t, h)
