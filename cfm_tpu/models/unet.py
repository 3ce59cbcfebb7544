"""Guided-diffusion UNet, re-designed TPU-first in flax.

Functional re-implementation of the reference's vendored OpenAI UNet
(/root/reference/torchcfm/models/unet/unet.py:369-632 ``UNetModel``,
:858-924 ``UNetModelWrapper``; layer helpers torchcfm/models/unet/nn.py).
Same capability surface — sinusoidal timestep embedding, class conditioning,
ResBlocks with optional FiLM scale-shift norm, QKV self-attention at chosen
resolutions, learned up/downsampling, zero-initialized output convs, gradient
checkpointing — but the implementation is TPU-native, not a translation:

- **NHWC layout.** Images are (N, H, W, C) end to end: the layout XLA:TPU
  convolutions are fastest in. (The reference is NCHW throughout.)
- **bf16 compute.** ``dtype=jnp.bfloat16`` runs convs/attention on the MXU in
  bf16 with fp32 parameters and fp32 GroupNorm — replacing the reference's
  entire fp16 master-param machinery (fp16_util.py:1-216) with two dtype
  arguments; no loss scaling is needed in bf16.
- **remat, not autograd.Function.** ``use_checkpoint=True`` wraps each
  ResBlock/Attention in ``nn.remat`` (= jax.checkpoint), the XLA-native form
  of the reference's manual CheckpointFunction (nn.py:108-153).
- **Attention** over the <=16x16=256 spatial tokens runs through a fused
  Pallas kernel on TPU (ops/pallas_attention.py): the whole (S, S) softmax
  stays in VMEM and the backward recomputes it, eliminating the O(S^2) HBM
  logits/weights tensors XLA's composition materializes. Off-TPU it is the
  identical-math jnp composition.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from cfm_tpu.ops.pallas_attention import fused_attention, fused_attention_t

Array = jax.Array


def timestep_embedding(timesteps: Array, dim: int, max_period: float = 10000.0) -> Array:
    """Sinusoidal timestep embeddings (reference nn.py ``timestep_embedding``).

    timesteps: (N,) float array (CFM uses t in [0, 1] directly).
    Returns (N, dim) fp32 embeddings.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) with fp32 statistics regardless of activation dtype.

    Parity with the reference's ``GroupNorm32`` (nn.py:20-22): normalization
    statistics in fp32 keep bf16 torsos stable. ``fuse_silu=True`` folds the
    following SiLU into the same pass and, on TPU, dispatches to the fused
    Pallas kernel (ops/pallas_groupnorm.py) — one bf16 read + one bf16 write
    instead of the cast/stats/normalize/cast/silu op chain.
    """

    num_groups: int = 32
    fuse_silu: bool = False
    # return_affine=True returns (out, scale, bias) so a caller fusing GN
    # into a downstream kernel (ops/pallas_attn_block.py) can read the
    # affine parameters while keeping this module — and therefore the
    # checkpoint param tree — unchanged; the unused `out` is DCE'd by XLA.
    return_affine: bool = False

    @nn.compact
    def __call__(self, x: Array):
        c = x.shape[-1]
        groups = min(self.num_groups, c)
        while c % groups:  # largest group count <= num_groups dividing c
            groups -= 1
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.return_affine:
            return self._norm(x, scale, bias, groups), scale, bias
        return self._norm(x, scale, bias, groups)

    def _norm(self, x: Array, scale: Array, bias: Array, groups: int) -> Array:

        # Plain jnp on purpose: XLA fuses the GN chain INTO its producer/
        # consumer ops; hand-written Pallas fwd+bwd GN kernels measured
        # SLOWER in-model (58.2 vs 44.7 ms/train-step at bs128 on v5e)
        # because pallas_call boundaries break those cross-op fusions.
        # Full experiment + kernels: ops/pallas_groupnorm.py.
        from ..ops.pallas_groupnorm import _gn_silu_reference

        if x.ndim == 4:
            return _gn_silu_reference(x, scale, bias, groups, 1e-5, self.fuse_silu)
        # Non-NHWC inputs (e.g. flattened token tensors) use plain fp32 GN.
        out = nn.GroupNorm(
            num_groups=groups, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=jnp.float32, use_scale=False, use_bias=False,
            name="raw_gn",
        )(x.astype(jnp.float32))
        out = out * scale + bias
        if self.fuse_silu:
            out = nn.silu(out)
        return out.astype(x.dtype)


def _zero_conv(features: int, kernel: Tuple[int, int], dtype) -> nn.Conv:
    """3x3 conv with zero-initialized kernel+bias (reference ``zero_module``)."""
    return nn.Conv(
        features,
        kernel,
        padding="SAME",
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class Upsample(nn.Module):
    """2x nearest-neighbour upsample + optional 3x3 conv (reference :74-96)."""

    use_conv: bool
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        if self.use_conv:
            x = nn.Conv(
                self.out_channels or c, (3, 3), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv or 2x2 average pool (reference :99-127)."""

    use_conv: bool
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        if self.use_conv:
            return nn.Conv(
                self.out_channels or c, (3, 3), strides=(2, 2), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        assert (self.out_channels or c) == c
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class FastDropout(nn.Module):
    """Dropout from 8-bit random draws (torch ``nn.Dropout`` semantics at the
    reference's ResBlock site, unet.py:130-234 — per-element mask, kept
    activations rescaled so E[out] == x).

    ``jax.random.bernoulli`` generates 32 random bits per element; TPU
    RngBitGenerator is VPU-rate-bound, so u8 draws run ~1.6x faster
    (measured v5e, 67M elements: 2.85 vs 4.59 ms) — ~0.7 ms/step on the
    CIFAR-10 recipe where mask generation is the whole train-vs-eval
    residual. The keep probability quantizes to ``round(keep*256)/256``
    (rate 0.1 -> keep 230/256 = 0.8984) and the rescale uses the REALIZED
    probability, so the estimator stays exactly unbiased.
    """

    rate: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        # Quantize the keep probability to thr/256, clamped one level off the
        # edges so any nonzero rate < 1 keeps dropping SOMETHING (rate 0.001
        # realizes the smallest representable drop 1/256, never a silent
        # no-op; symmetrically rate 0.999 never drops everything).
        thr = min(255, max(1, int(round((1.0 - self.rate) * 256.0))))
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, dtype=jnp.uint8)
        keep = bits < jnp.uint8(thr)
        return jnp.where(keep, x * jnp.asarray(256.0 / thr, x.dtype),
                         jnp.zeros_like(x))


class ResBlock(nn.Module):
    """Residual block with timestep-embedding conditioning (reference :130-234).

    ``use_scale_shift_norm`` switches additive conditioning (h + emb) to FiLM:
    h = norm(h) * (1 + scale) + shift.
    ``up``/``down`` resample both the residual branch and the skip.
    """

    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, emb: Array, train: bool = False) -> Array:
        c_in = x.shape[-1]
        c_out = self.out_channels or c_in

        h = GroupNorm32(fuse_silu=True)(x)
        if self.up:
            h = Upsample(False, dtype=self.dtype)(h)
            x = Upsample(False, dtype=self.dtype)(x)
        elif self.down:
            h = Downsample(False, dtype=self.dtype)(h)
            x = Downsample(False, dtype=self.dtype)(x)
        h = nn.Conv(c_out, (3, 3), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32)(h)

        emb_width = 2 * c_out if self.use_scale_shift_norm else c_out
        emb_out = nn.Dense(emb_width, dtype=self.dtype, param_dtype=jnp.float32)(
            nn.silu(emb)
        )[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32()(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32(fuse_silu=True)(h)
        h = FastDropout(self.dropout)(h, deterministic=not train)
        h = _zero_conv(c_out, (3, 3), self.dtype)(h)

        if c_out == c_in:
            skip = x
        else:
            skip = nn.Conv(c_out, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened H*W tokens (reference :237-366).

    One fused QKV projection; heads from ``num_heads`` or fixed
    ``num_head_channels``; zero-initialized output projection.
    """

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0, (
                f"channels {c} not divisible by num_head_channels {self.num_head_channels}"
            )
            heads = c // self.num_head_channels
        head_dim = c // heads

        normed, gn_scale, gn_bias = GroupNorm32(return_affine=True)(x)
        tokens = normed.reshape(n, h * w, c)

        # QKV in-projection emits the attention kernel's (N, 3, H, S, D)
        # layout DIRECTLY (and the out-projection consumes (N, H, S, D)):
        # with einsum projections XLA folds the layout change into the
        # matmuls' output/input maps, so the standalone qkv/out transpose
        # copies the reshape-based composition paid (~5.7 ms/step at bs128,
        # ROADMAP #4 / VERDICT r2 task 6) never materialize. The kernels are
        # mathematically nn.Dense(3c)/nn.Dense(c) with reshaped weights —
        # same init, same function (reference QKVAttention + zero-module
        # out-proj, unet.py:237-366).
        def _qkv_init(key, shape, dtype=jnp.float32):
            flat = nn.initializers.lecun_normal()(
                key, (shape[0], shape[1] * shape[2] * shape[3]), dtype
            )
            return flat.reshape(shape)

        wq = self.param("qkv_kernel", _qkv_init, (c, 3, heads, head_dim))
        bq = self.param("qkv_bias", nn.initializers.zeros,
                        (3, heads, head_dim), jnp.float32)
        wo = self.param("proj_kernel", nn.initializers.zeros,
                        (heads, head_dim, c), jnp.float32)
        bo = self.param("proj_bias", nn.initializers.zeros, (c,), jnp.float32)

        # Fully-fused path (round-4): GN + qkv proj + attention + out proj +
        # residual in ONE Pallas kernel per batch item — measured 24% faster
        # than the composition's forward at the recipe shape (the (S, C)
        # token and qkv tensors never round-trip HBM). The composition below
        # remains the off-TPU path and the numerics oracle; `normed` is
        # DCE'd by XLA when this branch is taken.
        from cfm_tpu.ops.pallas_attn_block import fused_attention_block, use_fused_block

        if use_fused_block(h * w, c, heads, x.dtype):
            groups = min(32, c)
            while c % groups:
                groups -= 1
            y = fused_attention_block(
                x.reshape(n, h * w, c),
                gn_scale.reshape(1, c), gn_bias.reshape(1, c),
                wq.reshape(c, 3 * heads * head_dim),
                bq.reshape(1, 3 * heads * head_dim),
                wo.reshape(heads * head_dim, c),
                bo.reshape(1, c),
                heads, groups,
            )
            return y.reshape(n, h, w, c)

        qkv_t = jnp.einsum(
            "nsc,ckhd->nkhsd", tokens.astype(self.dtype), wq.astype(self.dtype)
        ) + bq.astype(self.dtype)[None, :, :, None, :]

        # Fused Pallas attention on TPU (no O(S^2) HBM tensors, recompute
        # backward); identical-math jnp composition elsewhere — see
        # ops/pallas_attention.py for the traffic analysis that motivated it.
        scale = 1.0 / math.sqrt(head_dim)
        out_t = fused_attention_t(qkv_t, scale)  # (N, H, S, D)
        out = jnp.einsum(
            "nhsd,hdc->nsc", out_t, wo.astype(self.dtype)
        ) + bo.astype(self.dtype)
        return x + out.reshape(n, h, w, c)


class UNetModel(nn.Module):
    """The full UNet with attention and timestep embedding (reference :369-632).

    Input/output are NHWC: x (N, H, W, in_channels) -> (N, H, W, out_channels).
    ``attention_resolutions`` holds *downsample factors* (e.g. (2,) means
    attention where the feature map is at 1/2 resolution), matching the
    reference's ``ds`` bookkeeping after the wrapper's res->ds conversion.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[float] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    dtype: jnp.dtype = jnp.float32
    # Remat policy when use_checkpoint=True: None = save nothing (recompute
    # the whole block in backward, the reference checkpoint() semantics,
    # nn.py:108-153); "dots" = save conv/matmul outputs and recompute only
    # the elementwise/GN chains (jax.checkpoint_policies.checkpoint_dots) —
    # on an HBM-bound step this trades idle-MXU recompute for activation
    # traffic and can be net-faster, see bench notes.
    checkpoint_policy: Optional[str] = None

    @nn.compact
    def __call__(self, t: Array, x: Array, y: Optional[Array] = None, *, train: bool = False) -> Array:
        assert (y is not None) == (self.num_classes is not None), (
            "must specify y iff the model is class-conditional"
        )
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.full((x.shape[0],), t)

        if self.use_checkpoint:
            policies = {
                None: None,
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            }
            policy = policies[self.checkpoint_policy]
            Res = nn.remat(ResBlock, static_argnums=(3,), policy=policy)
            Attn = nn.remat(AttentionBlock, policy=policy)
        else:
            Res, Attn = ResBlock, AttentionBlock
        heads_up = self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample

        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(t, self.model_channels)
        emb = nn.Dense(time_embed_dim, param_dtype=jnp.float32)(emb)
        emb = nn.Dense(time_embed_dim, param_dtype=jnp.float32)(nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, time_embed_dim, param_dtype=jnp.float32)(y)

        in_dtype = x.dtype
        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32)(h)

        # Down path. hs collects skip activations exactly like the reference.
        # Every block gets an explicit stable name so checkpoints are
        # interchangeable between use_checkpoint=True/False (nn.remat would
        # otherwise rename the scope).
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = Res(
                    out_channels=ch,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"down{level}_res{i}",
                )(h, emb, train)
                if ds in self.attention_resolutions:
                    h = Attn(
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype,
                        name=f"down{level}_attn{i}",
                    )(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = Res(
                        out_channels=ch,
                        dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True,
                        dtype=self.dtype,
                        name=f"down{level}_downres",
                    )(h, emb, train)
                else:
                    h = Downsample(self.conv_resample, out_channels=ch,
                                   dtype=self.dtype, name=f"down{level}_down")(h)
                hs.append(h)
                ds *= 2

        # Middle.
        h = Res(
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype,
            name="mid_res0",
        )(h, emb, train)
        h = Attn(
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            dtype=self.dtype,
            name="mid_attn",
        )(h)
        h = Res(
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype,
            name="mid_res1",
        )(h, emb, train)

        # Up path with skip concatenation on the channel axis.
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = int(mult * self.model_channels)
                h = Res(
                    out_channels=ch,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"up{level}_res{i}",
                )(h, emb, train)
                if ds in self.attention_resolutions:
                    h = Attn(
                        num_heads=heads_up,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype,
                        name=f"up{level}_attn{i}",
                    )(h)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = Res(
                            out_channels=ch,
                            dropout=self.dropout,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=True,
                            dtype=self.dtype,
                            name=f"up{level}_upres",
                        )(h, emb, train)
                    else:
                        h = Upsample(self.conv_resample, out_channels=ch,
                                     dtype=self.dtype, name=f"up{level}_up")(h)
                    ds //= 2

        h = GroupNorm32(fuse_silu=True)(h.astype(in_dtype))
        return _zero_conv(self.out_channels, (3, 3), jnp.float32)(h)


_DEFAULT_CHANNEL_MULT = {
    512: (0.5, 1, 1, 2, 2, 4, 4),
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
    32: (1, 2, 2, 2),
    28: (1, 2, 2),
}

NUM_CLASSES = 1000


def UNetModelWrapper(
    dim: Tuple[int, int, int],
    num_channels: int,
    num_res_blocks: int,
    channel_mult: Optional[Sequence[float]] = None,
    learn_sigma: bool = False,
    class_cond: bool = False,
    num_classes: int = NUM_CLASSES,
    use_checkpoint: bool = False,
    attention_resolutions: str = "16",
    num_heads: int = 1,
    num_head_channels: int = -1,
    num_heads_upsample: int = -1,
    use_scale_shift_norm: bool = False,
    dropout: float = 0.0,
    resblock_updown: bool = False,
    dtype: jnp.dtype = jnp.float32,
    checkpoint_policy: Optional[str] = None,
) -> UNetModel:
    """Convenience constructor mirroring the reference wrapper (unet.py:858-924).

    ``dim`` is NHWC-style ``(H, W, C)`` — the TPU layout — unlike the
    reference's ``(C, H, W)``; 3-tuples with a leading channel count of 1 or 3
    are auto-detected and accepted for drop-in familiarity.
    ``attention_resolutions`` is a comma-separated string of *feature map
    sizes* (e.g. "16" on 32x32 images = attention at downsample factor 2).
    """
    if len(dim) != 3:
        raise ValueError(f"dim must be (H, W, C), got {dim}")
    if dim[0] in (1, 3) and dim[-1] not in (1, 3):
        dim = (dim[1], dim[2], dim[0])  # (C, H, W) given; convert
    image_size, in_channels = dim[0], dim[2]

    if channel_mult is None:
        try:
            channel_mult = _DEFAULT_CHANNEL_MULT[image_size]
        except KeyError:
            raise ValueError(f"unsupported image size: {image_size}")

    attention_ds = tuple(
        image_size // int(res) for res in str(attention_resolutions).split(",")
    )

    return UNetModel(
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=in_channels if not learn_sigma else in_channels * 2,
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=tuple(channel_mult),
        num_classes=num_classes if class_cond else None,
        use_checkpoint=use_checkpoint,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        dtype=dtype,
        checkpoint_policy=checkpoint_policy,
    )


class AttentionPool2d(nn.Module):
    """Attention-weighted global pooling (reference unet.py:23-50).

    Flattens the spatial map, prepends the mean token, runs one multi-head
    QKV attention with a learned positional embedding, returns the attended
    mean-token features.
    """

    embed_dim: int
    num_heads: int = 1
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (n, s+1, c)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(1.0 / math.sqrt(c)),
            (h * w + 1, c),
        )
        tokens = tokens + pos[None]
        s = tokens.shape[1]
        qkv = nn.Dense(3 * self.embed_dim, param_dtype=jnp.float32)(tokens)
        head_dim = self.embed_dim // self.num_heads
        q, k, v = jnp.split(qkv.reshape(n, s, 3, self.num_heads, head_dim), 3, axis=2)
        q, k, v = q.squeeze(2), k.squeeze(2), v.squeeze(2)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) / math.sqrt(head_dim)
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, s, self.embed_dim)
        out = nn.Dense(self.output_dim or self.embed_dim, param_dtype=jnp.float32)(out)
        return out[:, 0]


class SuperResModel(nn.Module):
    """Super-resolution UNet (reference unet.py:635-648): conditions on a
    low-resolution image by upsampling it to the target size and
    concatenating on the channel axis."""

    base: UNetModel

    @nn.compact
    def __call__(self, t: Array, x: Array, low_res: Array,
                 y: Optional[Array] = None, train: bool = False) -> Array:
        n, h, w, _ = x.shape
        upsampled = jax.image.resize(
            low_res, (n, h, w, low_res.shape[-1]), method="bilinear"
        )
        x = jnp.concatenate([x, upsampled], axis=-1)
        return self.base(t, x, y, train=train)


class EncoderUNetModel(nn.Module):
    """The down-path half of the UNet + a pooled head (reference :651-852).

    ``pool`` (reference :830-852 ``self.out``):
    - "adaptive": GN+SiLU, global mean pool, zero-initialized linear head
      (== the reference's AdaptiveAvgPool2d + zero 1x1 conv).
    - "attention": GN+SiLU, :class:`AttentionPool2d` with
      ``embed_dim // num_head_channels`` heads (``num_head_channels`` must be
      set, reference :837).
    - "spatial" / "spatial_v2": the reference concatenates the SPATIAL MEAN
      of every input block's output (including the stem conv and each
      downsample block) plus the middle block's — ``_feature_size`` channels
      in total (reference :869-880) — then MLP(2048) with ReLU ("spatial")
      or GroupNorm+SiLU ("spatial_v2") before the output layer. No final GN
      on the trunk for these modes.

    Used as a feature extractor / classifier over the diffusion trunk.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[float] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    pool: str = "adaptive"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: Array, x: Array, train: bool = False) -> Array:
        if self.pool not in ("adaptive", "attention", "spatial", "spatial_v2"):
            raise ValueError(f"Unknown pool: {self.pool}")
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.full((x.shape[0],), t)
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(t, self.model_channels)
        emb = nn.Dense(time_embed_dim, param_dtype=jnp.float32)(emb)
        emb = nn.Dense(time_embed_dim, param_dtype=jnp.float32)(nn.silu(emb))

        spatial = self.pool.startswith("spatial")
        feats = []

        def collect(h):
            if spatial:
                feats.append(jnp.mean(h.astype(jnp.float32), axis=(1, 2)))

        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32)(h)
        collect(h)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = ResBlock(
                    out_channels=ch,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"down{level}_res{i}",
                )(h, emb, train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype,
                        name=f"down{level}_attn{i}",
                    )(h)
                collect(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(
                        out_channels=ch,
                        dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True,
                        dtype=self.dtype,
                        name=f"down{level}_downres",
                    )(h, emb, train)
                else:
                    h = Downsample(self.conv_resample, out_channels=ch,
                                   dtype=self.dtype, name=f"down{level}_down")(h)
                collect(h)
                ds *= 2
        h = ResBlock(dropout=self.dropout,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res0")(h, emb, train)
        h = AttentionBlock(num_heads=self.num_heads,
                           num_head_channels=self.num_head_channels,
                           dtype=self.dtype, name="mid_attn")(h)
        h = ResBlock(dropout=self.dropout,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res1")(h, emb, train)
        collect(h)

        if spatial:
            flat = jnp.concatenate(feats, axis=-1)  # (n, _feature_size)
            hdn = nn.Dense(2048, param_dtype=jnp.float32)(flat)
            if self.pool == "spatial_v2":
                hdn = GroupNorm32(fuse_silu=True)(hdn)
            else:
                hdn = nn.relu(hdn)
            return nn.Dense(self.out_channels, param_dtype=jnp.float32)(hdn)

        h = GroupNorm32(fuse_silu=True)(h).astype(jnp.float32)
        if self.pool == "adaptive":
            pooled = jnp.mean(h, axis=(1, 2))
            # Zero-initialized head == the reference's zero_module 1x1 conv.
            return nn.Dense(
                self.out_channels,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                param_dtype=jnp.float32,
            )(pooled)
        # attention pool: heads fixed by channel width (reference :837).
        assert self.num_head_channels != -1, (
            "pool='attention' requires num_head_channels"
        )
        return AttentionPool2d(
            embed_dim=h.shape[-1],
            num_heads=h.shape[-1] // self.num_head_channels,
            output_dim=self.out_channels,
        )(h)
