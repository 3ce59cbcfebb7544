"""Torch mirror of the flax guided-diffusion UNet family, for parity testing.

Independent torch implementations of cfm_tpu.models.unet's UNetModel,
EncoderUNetModel (all pool modes), SuperResModel and AttentionPool2d — the
same documented math (reference torchcfm/models/unet/unet.py:23-50,369-632,
635-648,651-852), written functionally over the FLAX param tree: every
function takes the flax params dict and torch input tensors, so identical
random weights drive both implementations and the tests pin conv layout,
SAME-padding, GroupNorm statistics, attention head splitting, timestep
embedding and pooling conventions without any weight-copy mapping code.

Tensors are channels-last (N, H, W, C) like the flax side; convs permute to
NCHW internally. All math is fp32.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def T(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def timestep_embedding(t: torch.Tensor, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    if dim % 2:
        emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
    return emb


def dense(p, x):
    return x @ T(p["kernel"]) + T(p["bias"])


def _gn_groups(c: int, num_groups: int = 32) -> int:
    g = min(num_groups, c)
    while c % g:
        g -= 1
    return g


def groupnorm32(p, x, fuse_silu=False, eps=1e-5):
    """x: (N, H, W, C) or (N, C) channels-last."""
    scale, bias = T(p["scale"]), T(p["bias"])
    c = x.shape[-1]
    g = _gn_groups(c)
    if x.dim() == 4:
        xt = x.permute(0, 3, 1, 2)
        out = F.group_norm(xt, g, eps=eps).permute(0, 2, 3, 1)
    else:
        out = F.group_norm(x, g, eps=eps)
    out = out * scale + bias
    return F.silu(out) if fuse_silu else out


def _same_pads(size: int, k: int, stride: int):
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    lo = total // 2
    return lo, total - lo


def conv(p, x, stride=1):
    """XLA SAME-padded conv; flax kernel (kh, kw, cin, cout), x NHWC."""
    kernel, bias = T(p["kernel"]), T(p["bias"])
    kh, kw = kernel.shape[0], kernel.shape[1]
    xt = x.permute(0, 3, 1, 2)
    plo_h, phi_h = _same_pads(xt.shape[2], kh, stride)
    plo_w, phi_w = _same_pads(xt.shape[3], kw, stride)
    xt = F.pad(xt, (plo_w, phi_w, plo_h, phi_h))
    y = F.conv2d(xt, kernel.permute(3, 2, 0, 1), bias, stride=stride)
    return y.permute(0, 2, 3, 1)


def upsample_nearest(x):
    return (
        F.interpolate(x.permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
        .permute(0, 2, 3, 1)
    )


def downsample_avg(x):
    return F.avg_pool2d(x.permute(0, 3, 1, 2), 2, stride=2).permute(0, 2, 3, 1)


def upsample(p, x, use_conv):
    x = upsample_nearest(x)
    return conv(p["Conv_0"], x) if use_conv else x


def downsample(p, x, use_conv):
    return conv(p["Conv_0"], x, stride=2) if use_conv else downsample_avg(x)


def resblock(p, x, emb, use_scale_shift_norm=False, up=False, down=False):
    c_in = x.shape[-1]
    h = groupnorm32(p["GroupNorm32_0"], x, fuse_silu=True)
    if up:
        h, x = upsample_nearest(h), upsample_nearest(x)
    elif down:
        h, x = downsample_avg(h), downsample_avg(x)
    h = conv(p["Conv_0"], h)
    c_out = h.shape[-1]
    emb_out = dense(p["Dense_0"], F.silu(emb))[:, None, None, :]
    if use_scale_shift_norm:
        scale, shift = emb_out.chunk(2, dim=-1)
        h = groupnorm32(p["GroupNorm32_1"], h) * (1 + scale) + shift
        h = F.silu(h)
    else:
        h = h + emb_out
        h = groupnorm32(p["GroupNorm32_1"], h, fuse_silu=True)
    h = conv(p["Conv_1"], h)
    skip = x if c_out == c_in else conv(p["Conv_2"], x)
    return skip + h


def _n_heads(c: int, num_heads: int, num_head_channels: int) -> int:
    return num_heads if num_head_channels == -1 else c // num_head_channels


def attention_block(p, x, num_heads=1, num_head_channels=-1):
    n, h, w, c = x.shape
    heads = _n_heads(c, num_heads, num_head_channels)
    hd = c // heads
    tokens = groupnorm32(p["GroupNorm32_0"], x).reshape(n, h * w, c)
    wq, bq = T(p["qkv_kernel"]), T(p["qkv_bias"])       # (c,3,H,D), (3,H,D)
    wo, bo = T(p["proj_kernel"]), T(p["proj_bias"])     # (H,D,c), (c,)
    qkv = torch.einsum("nsc,ckhd->nkhsd", tokens, wq) + bq[None, :, :, None, :]
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]           # (n,H,s,D)
    logits = torch.einsum("nhqd,nhkd->nhqk", q, k) / math.sqrt(hd)
    att = torch.softmax(logits, dim=-1)
    out = torch.einsum("nhqk,nhkd->nhqd", att, v)
    out = torch.einsum("nhsd,hdc->nsc", out, wo) + bo
    return x + out.reshape(n, h, w, c)


def attention_pool2d(p, x, num_heads):
    """Mirror of cfm_tpu AttentionPool2d (reference unet.py:23-50)."""
    n, h, w, c = x.shape
    tokens = x.reshape(n, h * w, c)
    tokens = torch.cat([tokens.mean(dim=1, keepdim=True), tokens], dim=1)
    tokens = tokens + T(p["positional_embedding"])[None]
    s = tokens.shape[1]
    qkv = dense(p["Dense_0"], tokens)                   # (n, s, 3*embed)
    embed = qkv.shape[-1] // 3
    hd = embed // num_heads
    qkv = qkv.reshape(n, s, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (n,s,H,D)
    logits = torch.einsum("nqhd,nkhd->nhqk", q, k) / math.sqrt(hd)
    att = torch.softmax(logits, dim=-1)
    out = torch.einsum("nhqk,nkhd->nqhd", att, v).reshape(n, s, embed)
    out = dense(p["Dense_1"], out)
    return out[:, 0]


def _time_embed(p, t, model_channels):
    emb = timestep_embedding(t, model_channels)
    emb = dense(p["Dense_0"], emb)
    return dense(p["Dense_1"], F.silu(emb))


def unet_forward(p, cfg, t, x, y=None):
    """Full UNetModel mirror. cfg: dict of the flax module's config fields."""
    mc = cfg["model_channels"]
    emb = _time_embed(p, t, mc)
    if cfg.get("num_classes") is not None:
        emb = emb + T(p["Embed_0"]["embedding"])[y]
    ssn = cfg.get("use_scale_shift_norm", False)
    nh = cfg.get("num_heads", 1)
    nhc = cfg.get("num_head_channels", -1)
    nhu = cfg.get("num_heads_upsample", -1)
    heads_up = nh if nhu == -1 else nhu
    attn_res = tuple(cfg.get("attention_resolutions", ()))
    mult = list(cfg["channel_mult"])
    nrb = cfg["num_res_blocks"]
    conv_resample = cfg.get("conv_resample", True)
    resblock_updown = cfg.get("resblock_updown", False)

    h = conv(p["Conv_0"], x)
    hs = [h]
    ds = 1
    for level, _ in enumerate(mult):
        for i in range(nrb):
            h = resblock(p[f"down{level}_res{i}"], h, emb, ssn)
            if ds in attn_res:
                h = attention_block(p[f"down{level}_attn{i}"], h, nh, nhc)
            hs.append(h)
        if level != len(mult) - 1:
            if resblock_updown:
                h = resblock(p[f"down{level}_downres"], h, emb, ssn, down=True)
            else:
                h = downsample(p.get(f"down{level}_down", {}), h, conv_resample)
            hs.append(h)
            ds *= 2

    h = resblock(p["mid_res0"], h, emb, ssn)
    h = attention_block(p["mid_attn"], h, nh, nhc)
    h = resblock(p["mid_res1"], h, emb, ssn)

    for level, _ in reversed(list(enumerate(mult))):
        for i in range(nrb + 1):
            h = torch.cat([h, hs.pop()], dim=-1)
            h = resblock(p[f"up{level}_res{i}"], h, emb, ssn)
            if ds in attn_res:
                h = attention_block(p[f"up{level}_attn{i}"], h, heads_up, nhc)
            if level and i == nrb:
                if resblock_updown:
                    h = resblock(p[f"up{level}_upres"], h, emb, ssn, up=True)
                else:
                    h = upsample(p.get(f"up{level}_up", {}), h, conv_resample)
                ds //= 2

    h = groupnorm32(p["GroupNorm32_0"], h, fuse_silu=True)
    return conv(p["Conv_1"], h)


def superres_forward(p, cfg, t, x, low_res, y=None):
    """SuperResModel mirror: bilinear-upsample low_res, concat, base UNet."""
    n, h, w, _ = x.shape
    up = F.interpolate(
        low_res.permute(0, 3, 1, 2), size=(h, w), mode="bilinear",
        align_corners=False,
    ).permute(0, 2, 3, 1)
    return unet_forward(p["base"], cfg, t, torch.cat([x, up], dim=-1), y)


def encoder_forward(p, cfg, t, x):
    """EncoderUNetModel mirror, all four pool modes."""
    mc = cfg["model_channels"]
    emb = _time_embed(p, t, mc)
    ssn = cfg.get("use_scale_shift_norm", False)
    nh = cfg.get("num_heads", 1)
    nhc = cfg.get("num_head_channels", -1)
    attn_res = tuple(cfg.get("attention_resolutions", ()))
    mult = list(cfg["channel_mult"])
    nrb = cfg["num_res_blocks"]
    conv_resample = cfg.get("conv_resample", True)
    resblock_updown = cfg.get("resblock_updown", False)
    pool = cfg.get("pool", "adaptive")
    spatial = pool.startswith("spatial")

    feats = []

    def collect(h):
        if spatial:
            feats.append(h.mean(dim=(1, 2)))

    h = conv(p["Conv_0"], x)
    collect(h)
    ds = 1
    for level, _ in enumerate(mult):
        for i in range(nrb):
            h = resblock(p[f"down{level}_res{i}"], h, emb, ssn)
            if ds in attn_res:
                h = attention_block(p[f"down{level}_attn{i}"], h, nh, nhc)
            collect(h)
        if level != len(mult) - 1:
            if resblock_updown:
                h = resblock(p[f"down{level}_downres"], h, emb, ssn, down=True)
            else:
                h = downsample(p.get(f"down{level}_down", {}), h, conv_resample)
            collect(h)
            ds *= 2
    h = resblock(p["mid_res0"], h, emb, ssn)
    h = attention_block(p["mid_attn"], h, nh, nhc)
    h = resblock(p["mid_res1"], h, emb, ssn)
    collect(h)

    if spatial:
        flat = torch.cat(feats, dim=-1)
        hdn = dense(p["Dense_2"], flat)
        if pool == "spatial_v2":
            hdn = groupnorm32(p["GroupNorm32_0"], hdn, fuse_silu=True)
        else:
            hdn = F.relu(hdn)
        return dense(p["Dense_3"], hdn)

    h = groupnorm32(p["GroupNorm32_0"], h, fuse_silu=True)
    if pool == "adaptive":
        return dense(p["Dense_2"], h.mean(dim=(1, 2)))
    heads = h.shape[-1] // nhc
    return attention_pool2d(p["AttentionPool2d_0"], h, heads)
