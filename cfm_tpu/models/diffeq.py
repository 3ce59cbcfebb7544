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


class GatedLinear(nn.Module):
    """f(x) * sigmoid(g(x)) — time-free gated linear (basic.py GatedLinear)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.out_dim)(x) * jax.nn.sigmoid(nn.Dense(self.out_dim)(x))


# ---------------------------------------------------------------------------
# Conv2d family (basic.py:89-469). NHWC (the layout XLA:TPU convs are fastest
# in; the reference is NCHW). All share (t, x) -> y with x (n, h, w, c).
# ---------------------------------------------------------------------------


def _conv(out_ch: int, ksize, stride, transpose: bool, groups: int = 1,
          use_bias: bool = True, name: Optional[str] = None):
    k = (ksize, ksize) if isinstance(ksize, int) else ksize
    s = (stride, stride) if isinstance(stride, int) else stride
    if transpose:
        return nn.ConvTranspose(out_ch, kernel_size=k, strides=s,
                                padding="SAME", use_bias=use_bias, name=name)
    return nn.Conv(out_ch, kernel_size=k, strides=s, padding="SAME",
                   feature_group_count=groups, use_bias=use_bias, name=name)


def _t_plane(t, x: Array) -> Array:
    """Broadcast time to a (n, h, w, 1) feature plane."""
    t = jnp.asarray(t, x.dtype).reshape(-1)
    if t.shape[0] == 1:
        t = jnp.broadcast_to(t, (x.shape[0],))
    return jnp.broadcast_to(t[:, None, None, None], x.shape[:3] + (1,))


def _t_chan(t, x: Array, out_dim: int, use_bias: bool = True,
            name: Optional[str] = None) -> Array:
    """Dense(t) broadcast over space: (n, 1, 1, out)."""
    t = jnp.asarray(t, x.dtype).reshape(-1)
    if t.shape[0] == 1:
        t = jnp.broadcast_to(t, (x.shape[0],))
    y = nn.Dense(out_dim, use_bias=use_bias, name=name)(t[:, None])
    return y[:, None, None, :]


class IgnoreConv2d(nn.Module):
    out_channels: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        return _conv(self.out_channels, self.ksize, self.stride, self.transpose, use_bias=self.use_bias)(x)


class ConcatConv2d(nn.Module):
    """Conv over [t-plane, x] channels (basic.py ConcatConv2d)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        ttx = jnp.concatenate([_t_plane(t, x), x], axis=-1)
        return _conv(self.out_channels, self.ksize, self.stride, self.transpose, use_bias=self.use_bias)(ttx)


class ConcatConv2d_v2(nn.Module):
    """Conv(x) + per-channel bias(t) (basic.py ConcatConv2d_v2)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        return _conv(self.out_channels, self.ksize, self.stride, self.transpose, use_bias=self.use_bias)(x) \
            + _t_chan(t, x, self.out_channels, use_bias=False)


class SquashConv2d(nn.Module):
    """Conv([t, x]) * sigmoid(gate(t)) (basic.py SquashConv2d)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        ttx = jnp.concatenate([_t_plane(t, x), x], axis=-1)
        y = _conv(self.out_channels, self.ksize, self.stride, self.transpose, use_bias=self.use_bias)(ttx)
        return y * jax.nn.sigmoid(_t_chan(t, x, self.out_channels))


class ConcatSquashConv2d(nn.Module):
    """Conv(x) * sigmoid(gate(t)) + bias(t) (basic.py ConcatSquashConv2d)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        y = _conv(self.out_channels, self.ksize, self.stride, self.transpose, use_bias=self.use_bias)(x)
        return y * jax.nn.sigmoid(_t_chan(t, x, self.out_channels, name="gate")) \
            + _t_chan(t, x, self.out_channels, use_bias=False, name="bias")


class ConcatCoordConv2d(nn.Module):
    """Conv over [x, t-plane, row-plane, col-plane] (basic.py
    ConcatCoordConv2d): coordinate channels give the kernel absolute
    position awareness."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        n, h, w, _ = x.shape
        hh = jnp.broadcast_to(
            jnp.arange(h, dtype=x.dtype)[None, :, None, None], (n, h, w, 1))
        ww = jnp.broadcast_to(
            jnp.arange(w, dtype=x.dtype)[None, None, :, None], (n, h, w, 1))
        aug = jnp.concatenate([x, _t_plane(t, x), hh, ww], axis=-1)
        return _conv(self.out_channels, self.ksize, self.stride, self.transpose, use_bias=self.use_bias)(aug)


class BlendConv2d(nn.Module):
    """y0 + t (y1 - y0) over two convs (basic.py BlendConv2d)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    transpose: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        y0 = _conv(self.out_channels, self.ksize, self.stride, self.transpose,
                   use_bias=self.use_bias, name="conv0")(x)
        y1 = _conv(self.out_channels, self.ksize, self.stride, self.transpose,
                   use_bias=self.use_bias, name="conv1")(x)
        tt = jnp.asarray(t, x.dtype).reshape(-1)
        if tt.shape[0] == 1:
            tt = jnp.broadcast_to(tt, (x.shape[0],))
        return y0 + tt[:, None, None, None] * (y1 - y0)


class HyperConv2d(nn.Module):
    """Conv whose kernel and bias are generated from t by a hypernetwork
    (basic.py HyperConv2d). The generated kernel is shared across the batch
    (the reference evaluates one scalar t per solver step)."""

    in_channels: int
    out_channels: int
    ksize: int = 3

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        k = self.ksize
        n_w = k * k * self.in_channels * self.out_channels
        t0 = jnp.asarray(t, x.dtype).reshape(-1)[:1]   # scalar t
        wb = nn.Dense(n_w + self.out_channels)(t0[:, None])[0]
        w = wb[:n_w].reshape(k, k, self.in_channels, self.out_channels)
        b = wb[n_w:]
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b[None, None, None, :]


class GatedConv(nn.Module):
    """f(x) * sigmoid(g(x)), conv form (basic.py GatedConv)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = _conv(self.out_channels, self.ksize, self.stride, False, name="f")(x)
        g = _conv(self.out_channels, self.ksize, self.stride, False, name="g")(x)
        return f * jax.nn.sigmoid(g)


class GatedConvTranspose(nn.Module):
    """Transposed-conv gated pair (basic.py GatedConvTranspose)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = _conv(self.out_channels, self.ksize, self.stride, True, name="f")(x)
        g = _conv(self.out_channels, self.ksize, self.stride, True, name="g")(x)
        return f * jax.nn.sigmoid(g)


_CONV_LAYER_TYPES = {
    "ignore": IgnoreConv2d,
    "concat": ConcatConv2d,
    "concat_v2": ConcatConv2d_v2,
    "squash": SquashConv2d,
    "concatsquash": ConcatSquashConv2d,
    "concatcoord": ConcatCoordConv2d,
    "blend": BlendConv2d,
}


class ConvODEnet(nn.Module):
    """Conv stack of time-conditioned layers (reference odefunc.py ODEnet's
    conv mode, :42-148): the CNF drift net for image-space flows. NHWC;
    output has ``out_channels`` (= input channels for a flow field).

    ``strides`` (len = len(hidden_channels)+1, entries 1 | 2 | -2) selects
    per-layer down/upsampling exactly like the reference (stride 2 = ksize-4
    downsample, -2 = ksize-4 transpose upsample); ``num_squeeze`` applies
    space-to-depth before the stack and depth-to-space after (odefunc.py
    forward :134-148)."""

    hidden_channels: Sequence[int]
    out_channels: int
    layer_type: str = "concatsquash"
    nonlinearity: str = "softplus"
    strides: Optional[Sequence[int]] = None
    num_squeeze: int = 0

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        layer_cls = _CONV_LAYER_TYPES[self.layer_type]
        act = _NONLINEARITIES[self.nonlinearity]
        widths = tuple(self.hidden_channels) + (self.out_channels,)
        strides = self.strides or (1,) * len(widths)
        assert len(strides) == len(widths), "need len(hidden)+1 strides"
        h = x
        for _ in range(self.num_squeeze):
            h = squeeze2d(h, 2)
        for i, (ch, s) in enumerate(zip(widths, strides)):
            if s == 1:
                layer = layer_cls(out_channels=ch)
            elif s == 2:
                layer = layer_cls(out_channels=ch, ksize=4, stride=2)
            elif s == -2:
                layer = layer_cls(out_channels=ch, ksize=4, stride=2,
                                  transpose=True)
            else:
                raise ValueError(f"Unsupported stride: {s}")
            h = layer(t, h)
            if i < len(widths) - 1:
                h = act(h)
        for _ in range(self.num_squeeze):
            h = unsqueeze2d(h, 2)
        return h


# ---------------------------------------------------------------------------
# Containers and wrappers (diffeq_layers/container.py, wrappers.py,
# resnet.py). All take/return (t, x) like the rest of the family.
# ---------------------------------------------------------------------------


class DiffEqWrapper(nn.Module):
    """Adapt a time-free ``x -> y`` module to the ``(t, x) -> y`` protocol
    (wrappers.py DiffEqWrapper). flax modules are dataclasses, so instead of
    signature introspection the adapter simply drops t."""

    module: nn.Module

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        return self.module(x)


def diffeq_wrap(layer: nn.Module) -> nn.Module:
    """diffeq_wrapper: wrap iff the module is time-free. Time-aware diffeq
    layers in this file all subclass nn.Module and take (t, x); callers tag
    time-free layers explicitly by passing them through this helper."""
    return DiffEqWrapper(module=layer)


class SequentialDiffEq(nn.Module):
    """Sequential chain of (t, x) layers sharing the same t
    (container.py SequentialDiffEq)."""

    layers: Sequence[nn.Module]

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        for layer in self.layers:
            x = layer(t, x)
        return x


class MixtureODELayer(nn.Module):
    """Mixture of experts: dy = sum_i sigma_i(t) * f_i(t, y) with
    time-dependent mixture weights (container.py MixtureODELayer)."""

    experts: Sequence[nn.Module]

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        assert len(self.experts) > 1
        dys = jnp.stack([f(t, x) for f in self.experts], axis=0)  # (E, bs, ...)
        # Per-SAMPLE weights: broadcast scalar t to the batch like every
        # other layer in this family (the reference evaluates one scalar t
        # per solver step; truncating a batched t to t[0] would silently
        # mis-weight every sample but the first).
        tc = _t_col(t, x)                                      # (bs, 1)
        w = nn.Dense(len(self.experts), name="mixture_weights")(tc)  # (bs, E)
        w = jnp.moveaxis(w, -1, 0)                             # (E, bs)
        w = w.reshape(w.shape + (1,) * (dys.ndim - 2))
        return jnp.sum(dys * w, axis=0)


class ReshapeDiffEq(nn.Module):
    """View flat (bs, prod(shape)) state as ``input_shape`` for an inner
    (t, x) net, then flatten back (wrappers.py ReshapeDiffEq) — lets image
    CNF drift nets run inside flat-state integrators."""

    input_shape: Sequence[int]
    net: nn.Module

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        bs = x.shape[0]
        y = self.net(t, x.reshape(bs, *self.input_shape))
        return y.reshape(bs, -1)


class BasicResBlock(nn.Module):
    """Pre-activation residual block over a time-conditioned conv
    (resnet.py BasicBlock): GN(16) -> relu -> conv -> GN -> relu -> conv + x.
    NHWC; fp32 GroupNorm statistics."""

    dim: int
    conv_layer: str = "concatcoord"

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        conv_cls = _CONV_LAYER_TYPES[self.conv_layer]
        groups = min(16, self.dim)
        h = nn.GroupNorm(num_groups=groups, epsilon=1e-4, dtype=jnp.float32)(x)
        h = conv_cls(out_channels=self.dim, use_bias=False)(t, nn.relu(h))
        h = nn.GroupNorm(num_groups=groups, epsilon=1e-4, dtype=jnp.float32)(h)
        h = conv_cls(out_channels=self.dim, use_bias=False)(t, nn.relu(h))
        return h + x


class ResNetDiffEq(nn.Module):
    """Residual CNF drift net (resnet.py ResNet): lift to intermediate_dim,
    n residual blocks, GN+relu head, 1x1 project back to dim."""

    dim: int
    intermediate_dim: int
    n_resblocks: int
    conv_layer: str = "concatcoord"

    @nn.compact
    def __call__(self, t, x: Array) -> Array:
        conv_cls = _CONV_LAYER_TYPES[self.conv_layer]
        h = conv_cls(out_channels=self.intermediate_dim, use_bias=False)(t, x)
        for _ in range(self.n_resblocks):
            h = BasicResBlock(dim=self.intermediate_dim,
                              conv_layer=self.conv_layer)(t, h)
        h = nn.GroupNorm(num_groups=min(16, self.intermediate_dim),
                         epsilon=1e-4, dtype=jnp.float32)(h)
        h = conv_cls(out_channels=self.dim, ksize=1, use_bias=False)(
            t, nn.relu(h))
        return h


# ---------------------------------------------------------------------------
# Squeeze (space-to-depth) — layers/squeeze.py. NHWC; volume-preserving, so
# the CNF log-prob passes through unchanged.
# ---------------------------------------------------------------------------


def squeeze2d(x: Array, factor: int = 2) -> Array:
    """(n, H*r, W*r, c) -> (n, H, W, c*r^2) space-to-depth (squeeze.py:49)."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // r, w // r, c * r * r)


def unsqueeze2d(x: Array, factor: int = 2) -> Array:
    """(n, H, W, c*r^2) -> (n, H*r, W*r, c) depth-to-space (squeeze.py:33)."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c // (r * r))


class SqueezeLayer(nn.Module):
    """Invertible squeeze with logp passthrough (squeeze.py SqueezeLayer):
    volume-preserving rearrangement, |det J| = 1."""

    downscale_factor: int = 2

    def __call__(self, x: Array, logpx: Optional[Array] = None,
                 reverse: bool = False):
        y = (unsqueeze2d if reverse else squeeze2d)(x, self.downscale_factor)
        return y if logpx is None else (y, logpx)


class AutoencoderDiffEqNet(nn.Module):
    """Encoder/decoder CNF drift net returning (h, dx) — the bottleneck
    activation and the drift — for FFJORD's autoencoder-trace estimator
    (reference odefunc.py AutoencoderDiffEqNet, :150-258). The first
    len(hidden)//2 + 1 layers are the encoder (nonlinearity after each),
    the rest the decoder (nonlinearity between, none after the last).

    ``conv=False``: linear family over (bs, d); ``conv=True``: NHWC conv
    family with the reference's stride convention (1 | 2 | -2)."""

    hidden_dims: Sequence[int]
    out_dim: int
    conv: bool = False
    layer_type: str = "concat"
    nonlinearity: str = "softplus"
    strides: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, t, x: Array):
        assert self.layer_type in ("ignore", "squash", "concat", "concatcoord", "blend")
        act = _NONLINEARITIES[self.nonlinearity]
        widths = tuple(self.hidden_dims) + (self.out_dim,)
        n_enc = len(self.hidden_dims) // 2 + 1

        def build(i, w, s):
            if self.conv:
                cls = _CONV_LAYER_TYPES["concatcoord" if self.layer_type == "concatcoord"
                                        else self.layer_type]
                if s == 2:
                    return cls(out_channels=w, ksize=4, stride=2)
                if s == -2:
                    return cls(out_channels=w, ksize=4, stride=2, transpose=True)
                return cls(out_channels=w)
            cls = _LAYER_TYPES["concat" if self.layer_type == "concatcoord"
                               else self.layer_type]
            return cls(out_dim=w)

        strides = self.strides or (1,) * len(widths)
        assert len(strides) == len(widths), "need len(hidden)+1 strides"
        h = x
        for i in range(n_enc):
            h = act(build(i, widths[i], strides[i])(t, h))
        dx = h
        for j in range(n_enc, len(widths)):
            dx = build(j, widths[j], strides[j])(t, dx)
            if j < len(widths) - 1:
                dx = act(dx)
        return h, dx
