"""Small vector-field networks for 2-D / tabular flow matching.

TPU-native re-designs of:
- ``MLP`` / ``GradModel``            /root/reference/torchcfm/models/models.py:4-32
- ``VelocityNet`` family             /root/reference/runner/src/models/components/simple_mlp.py:18-85
- ``SimpleDenseNet``                 /root/reference/runner/src/models/components/simple_dense_net.py
- ``ICNN``                           /root/reference/runner/src/models/components/icnn_model.py:5-29

All take ``(t, x)`` with a batched time vector ``t`` of shape (bs,) and return
the velocity — the uniform framework model signature (the reference instead
concatenates t outside the net via ``torch_wrapper``, torchcfm/utils.py:44-52;
here the concat lives inside ``__call__`` so the jitted caller never sees it).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_ACTIVATIONS = {
    "relu": nn.relu,
    "selu": nn.selu,
    "gelu": nn.gelu,
    "silu": nn.silu,
    "swish": nn.silu,
    "tanh": jnp.tanh,
    "leaky_relu": nn.leaky_relu,
    "softplus": nn.softplus,
}


def _join_tx(t: Array, x: Array) -> Array:
    """Concatenate per-sample time onto the feature axis: (bs, d) -> (bs, d+1)."""
    t = jnp.broadcast_to(jnp.asarray(t, x.dtype).reshape(-1), (x.shape[0],))
    return jnp.concatenate([x, t[:, None]], axis=-1)


class MLP(nn.Module):
    """3-hidden-layer SELU MLP, the 2-D tutorial workhorse (models.py:4-21).

    time_varying=True appends t to the input exactly like the reference's
    ``dim + (1 if time_varying else 0)`` input width.
    """

    dim: int
    out_dim: int | None = None
    w: int = 64
    time_varying: bool = True

    @nn.compact
    def __call__(self, t: Array, x: Array) -> Array:
        h = _join_tx(t, x) if self.time_varying else x
        for _ in range(3):
            h = nn.selu(nn.Dense(self.w)(h))
        return nn.Dense(self.out_dim or self.dim)(h)


class VelocityNet(nn.Module):
    """Configurable t-concat MLP (simple_mlp.py:18-58): in = dim+1 -> dim."""

    dim: int
    hidden_dims: Sequence[int] = (64, 64, 64)
    activation: str = "selu"
    batch_norm: bool = False

    @nn.compact
    def __call__(self, t: Array, x: Array, train: bool = False) -> Array:
        act = _ACTIVATIONS[self.activation]
        h = _join_tx(t, x)
        for width in self.hidden_dims:
            h = nn.Dense(width)(h)
            if self.batch_norm:
                h = nn.BatchNorm(use_running_average=not train)(h)
            h = act(h)
        return nn.Dense(self.dim)(h)


class TimeInvariantVelocityNet(nn.Module):
    """Velocity net that ignores t (simple_mlp.py:61-85)."""

    dim: int
    hidden_dims: Sequence[int] = (64, 64, 64)
    activation: str = "selu"

    @nn.compact
    def __call__(self, t: Array, x: Array) -> Array:
        del t
        act = _ACTIVATIONS[self.activation]
        h = x
        for width in self.hidden_dims:
            h = act(nn.Dense(width)(h))
        return nn.Dense(self.dim)(h)


class SimpleDenseNet(nn.Module):
    """Plain feature MLP (simple_dense_net.py) for classification-style heads."""

    input_size: int = 784
    hidden_dims: Sequence[int] = (256, 256, 256)
    output_size: int = 10
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = _ACTIVATIONS[self.activation]
        h = x.reshape(x.shape[0], -1)
        for width in self.hidden_dims:
            h = act(nn.Dense(width)(h))
        return nn.Dense(self.output_size)(h)


class _ActionNet(nn.Module):
    """Scalar action s(t, x) used by GradModel."""

    w: int = 64

    @nn.compact
    def __call__(self, t: Array, x: Array) -> Array:
        h = _join_tx(t, x)
        for _ in range(3):
            h = nn.selu(nn.Dense(self.w)(h))
        return nn.Dense(1)(h)


class GradModel(nn.Module):
    """Vector field as the gradient of a scalar action (models.py:24-32).

    The reference differentiates through an inner ``requires_grad`` trick;
    here it is a literal ``jax.grad`` of the scalar net output per sample —
    pure, jit-safe, and exact. Also covers ``DivergenceFreeNet``-style
    potential fields (simple_mlp.py).
    """

    w: int = 64

    def setup(self):
        self.action = _ActionNet(w=self.w)

    def __call__(self, t: Array, x: Array) -> Array:
        def scalar(ti, xi):
            return self.action(ti[None], xi[None])[0, 0]

        return jax.vmap(jax.grad(scalar, argnums=1))(
            jnp.broadcast_to(jnp.asarray(t, x.dtype).reshape(-1), (x.shape[0],)), x
        )


class ICNN(nn.Module):
    """Input-convex neural network (icnn_model.py:5-29).

    f(x) convex in x: hidden path z_{k+1} = softplus(W_z^+ z_k + W_x x + b)
    with W_z constrained nonnegative at apply time (clipping lives in the
    training loop as in the reference's convexity penalty; here we take
    softplus of the kernel so convexity holds by construction).
    """

    dim: int
    hidden_dims: Sequence[int] = (64, 64, 64, 64)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        z = nn.softplus(nn.Dense(self.hidden_dims[0], use_bias=True)(x))
        for k, width in enumerate(self.hidden_dims[1:]):
            wz = self.param(
                f"wz_{k}",
                nn.initializers.normal(0.05),
                (z.shape[-1], width),
            )
            zx = nn.Dense(width, use_bias=True)(x)
            z = nn.softplus(z @ nn.softplus(wz) + zx)
        wz_out = self.param(
            "wz_out", nn.initializers.normal(0.05), (z.shape[-1], 1)
        )
        quad = 0.5 * jnp.sum(jnp.square(x), axis=-1, keepdims=True)
        return z @ nn.softplus(wz_out) + quad

    def transport(self, params, x: Array) -> Array:
        """OT map as the gradient of the convex potential: T(x) = ∇f(x)."""

        def f_scalar(xi):
            return self.apply(params, xi[None])[0, 0]

        return jax.vmap(jax.grad(f_scalar))(x)
