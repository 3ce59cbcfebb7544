"""Model construction + forward smoke tests and gradient-field properties.

Extends the reference's construction-only smoke test
(/root/reference/tests/test_models.py:5-13) with shape checks, class
conditioning, remat equivalence, and GradModel's conservative-field property.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfm_tpu.models import (
    ICNN,
    MLP,
    GradModel,
    SimpleDenseNet,
    TimeInvariantVelocityNet,
    UNetModelWrapper,
    VelocityNet,
)


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_mlp_shapes(key):
    m = MLP(dim=2)
    params = m.init(key, jnp.zeros((4,)), jnp.zeros((4, 2)))
    out = m.apply(params, jnp.linspace(0, 1, 4), jnp.ones((4, 2)))
    assert out.shape == (4, 2)


def test_mlp_time_invariant(key):
    m = MLP(dim=3, time_varying=False)
    params = m.init(key, jnp.zeros((4,)), jnp.zeros((4, 3)))
    a = m.apply(params, jnp.zeros((4,)), jnp.ones((4, 3)))
    b = m.apply(params, jnp.ones((4,)), jnp.ones((4, 3)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_velocity_net_variants(key):
    for net in [VelocityNet(dim=2), TimeInvariantVelocityNet(dim=2)]:
        params = net.init(key, jnp.zeros((4,)), jnp.zeros((4, 2)))
        assert net.apply(params, jnp.zeros((4,)), jnp.ones((4, 2))).shape == (4, 2)
    dense = SimpleDenseNet(input_size=8, output_size=5)
    params = dense.init(key, jnp.zeros((4, 8)))
    assert dense.apply(params, jnp.ones((4, 8))).shape == (4, 5)


def test_grad_model_is_conservative(key):
    """A gradient field has symmetric Jacobian (curl-free in 2D)."""
    g = GradModel(w=32)
    params = g.init(key, jnp.zeros((1,)), jnp.zeros((1, 2)))

    def field(x):
        return g.apply(params, jnp.full((1,), 0.3), x[None])[0]

    x = jnp.array([0.7, -0.2])
    J = jax.jacobian(field)(x)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J.T), rtol=1e-4, atol=1e-5)


def test_icnn_convex_along_segments(key):
    icnn = ICNN(dim=2, hidden_dims=(16, 16))
    params = icnn.init(key, jnp.zeros((1, 2)))
    a = jax.random.normal(jax.random.PRNGKey(1), (32, 2))
    b = jax.random.normal(jax.random.PRNGKey(2), (32, 2))
    fa = icnn.apply(params, a)[:, 0]
    fb = icnn.apply(params, b)[:, 0]
    fm = icnn.apply(params, 0.5 * (a + b))[:, 0]
    assert bool(jnp.all(fm <= 0.5 * (fa + fb) + 1e-5))


def test_unet_unconditional(key):
    u = UNetModelWrapper(dim=(32, 32, 3), num_channels=16, num_res_blocks=1,
                         attention_resolutions="16", num_heads=2)
    params = u.init(key, jnp.zeros((2,)), jnp.zeros((2, 32, 32, 3)))
    out = u.apply(params, jnp.full((2,), 0.5), jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 32, 32, 3)


def test_unet_zero_init_output(key):
    """Final conv is zero-initialized: output at init is exactly 0 (reference
    ``zero_module`` semantics, unet.py:583-586)."""
    u = UNetModelWrapper(dim=(32, 32, 3), num_channels=16, num_res_blocks=1)
    params = u.init(key, jnp.zeros((2,)), jnp.zeros((2, 32, 32, 3)))
    out = u.apply(params, jnp.full((2,), 0.5), jnp.ones((2, 32, 32, 3)))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet_class_conditional_28(key):
    """Class-conditional 28x28 construction — the reference smoke test's config
    (tests/test_models.py:5-13: UNetModel with class_cond, 28x28)."""
    u = UNetModelWrapper(dim=(28, 28, 1), num_channels=16, num_res_blocks=1,
                         class_cond=True, num_classes=10)
    params = u.init(key, jnp.zeros((2,)), jnp.zeros((2, 28, 28, 1)),
                    jnp.zeros((2,), jnp.int32))
    y = jnp.array([3, 7])
    out = u.apply(params, jnp.full((2,), 0.5), jnp.ones((2, 28, 28, 1)), y)
    assert out.shape == (2, 28, 28, 1)
    # Different labels give different outputs once params are perturbed.
    params2 = jax.tree.map(lambda p: p + 0.01, params)
    o1 = u.apply(params2, jnp.full((2,), 0.5), jnp.ones((2, 28, 28, 1)), jnp.array([1, 1]))
    o2 = u.apply(params2, jnp.full((2,), 0.5), jnp.ones((2, 28, 28, 1)), jnp.array([2, 2]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_unet_remat_matches_no_remat(key):
    """use_checkpoint only rematerializes; outputs must be bitwise-close."""
    kwargs = dict(dim=(32, 32, 3), num_channels=16, num_res_blocks=1,
                  attention_resolutions="16")
    u1 = UNetModelWrapper(use_checkpoint=False, **kwargs)
    u2 = UNetModelWrapper(use_checkpoint=True, **kwargs)
    params = u1.init(key, jnp.zeros((1,)), jnp.zeros((1, 32, 32, 3)))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
    t = jnp.full((1,), 0.25)
    o1 = u1.apply(params, t, x)
    o2 = u2.apply(params, t, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)


def test_unet_bf16_torso(key):
    u = UNetModelWrapper(dim=(32, 32, 3), num_channels=16, num_res_blocks=1,
                         dtype=jnp.bfloat16)
    params = u.init(key, jnp.zeros((1,)), jnp.zeros((1, 32, 32, 3)))
    # Params stay fp32 (master weights), activations run bf16.
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    out = u.apply(params, jnp.full((1,), 0.5), jnp.ones((1, 32, 32, 3)))
    assert out.dtype == jnp.float32


def test_diffeq_layers(key):
    from cfm_tpu.models.diffeq import _LAYER_TYPES, ODEnet

    x = jnp.ones((4, 3))
    t = jnp.full((4,), 0.5)
    for name, cls in _LAYER_TYPES.items():
        layer = cls(out_dim=5)
        params = layer.init(jax.random.PRNGKey(0), t, x)
        out = layer.apply(params, t, x)
        assert out.shape == (4, 5), name
        if name != "ignore":
            # Time must influence the output.
            out2 = layer.apply(params, jnp.zeros((4,)), x)
            assert not np.allclose(np.asarray(out), np.asarray(out2)), name

    net = ODEnet(hidden_dims=(16, 16), out_dim=3)
    params = net.init(jax.random.PRNGKey(1), t, x)
    assert net.apply(params, t, x).shape == (4, 3)
    # Scalar t broadcast.
    assert net.apply(params, 0.3, x).shape == (4, 3)


def test_fused_gn_silu_matches_flax(key):
    """The GroupNorm32 jnp path == flax GroupNorm + silu (both CPU)."""
    import flax.linen as nn_

    from cfm_tpu.ops.pallas_groupnorm import _gn_silu_reference

    x = jax.random.normal(key, (4, 8, 8, 64))
    scale = jax.random.normal(jax.random.fold_in(key, 1), (64,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (64,)) * 0.1
    gn = nn_.GroupNorm(num_groups=32, epsilon=1e-5)
    expected = nn_.silu(gn.apply({"params": {"scale": scale, "bias": bias}}, x))
    got = _gn_silu_reference(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
    # And the VJP of the custom-vjp wrapper agrees with autodiff of the chain.
    from cfm_tpu.ops.pallas_groupnorm import fused_group_norm_silu

    g1 = jax.grad(lambda x: jnp.sum(fused_group_norm_silu(x, scale, bias, 32) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(
        nn_.silu(gn.apply({"params": {"scale": scale, "bias": bias}}, x)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-4)


# ---------------------------------------------------------------------------
# Fused Pallas attention (ops/pallas_attention.py)
# ---------------------------------------------------------------------------


def _rand_qkv(key, n, s, h, d, dtype):
    return jax.random.normal(key, (n, s, 3, h, d), dtype=jnp.float32).astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_attention_interpret_matches_reference(key, dtype):
    """Pallas kernel math (interpret mode, runs on CPU) == the jnp
    composition, forward and VJP."""
    from cfm_tpu.ops import pallas_attention as pa

    qkv = _rand_qkv(key, 2, 256, 2, 64, dtype)
    scale = 1.0 / 8.0
    ref = pa._attn_reference(qkv, scale)
    refg = jax.grad(lambda a: jnp.sum(pa._attn_reference(a, scale) ** 2))(qkv)
    old = pa.INTERPRET
    pa.INTERPRET = True
    try:
        got = pa.fused_attention(qkv, scale)
        gotg = jax.grad(lambda a: jnp.sum(pa.fused_attention(a, scale) ** 2))(qkv)
    finally:
        pa.INTERPRET = old
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=tol)
    np.testing.assert_allclose(
        np.asarray(gotg, np.float32), np.asarray(refg, np.float32), atol=tol * 20)


def test_fused_attention_fallback_grads(key):
    """Off-TPU (and for unaligned shapes) the custom-vjp wrapper must equal
    plain autodiff of the composition."""
    from cfm_tpu.ops import pallas_attention as pa

    qkv = _rand_qkv(key, 2, 100, 3, 17, jnp.float32)  # unaligned -> fallback
    scale = 0.3
    f1 = lambda a: jnp.sum(jnp.sin(pa.fused_attention(a, scale)))
    f2 = lambda a: jnp.sum(jnp.sin(pa._attn_reference(a, scale)))
    np.testing.assert_allclose(float(f1(qkv)), float(f2(qkv)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f1)(qkv)), np.asarray(jax.grad(f2)(qkv)), atol=1e-6)


def test_fused_attention_on_tpu(key):
    if jax.default_backend() == "cpu":
        pytest.skip("pallas attention kernel needs a TPU backend")
    from cfm_tpu.ops import pallas_attention as pa

    qkv = _rand_qkv(key, 4, 256, 4, 64, jnp.bfloat16)
    scale = 0.125
    got = pa.fused_attention(qkv, scale)
    ref = pa._attn_reference(qkv, scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2)
    g1 = jax.grad(lambda a: jnp.sum(pa.fused_attention(a, scale) ** 2))(qkv)
    g2 = jax.grad(lambda a: jnp.sum(pa._attn_reference(a, scale) ** 2))(qkv)
    np.testing.assert_allclose(
        np.asarray(g1, np.float32), np.asarray(g2, np.float32), atol=0.3)


def test_conv_diffeq_layers(key):
    """Conv2d diffeq family (reference diffeq_layers/basic.py:89-469) in
    NHWC: every registry layer maps (t, x) -> (n, h, w, out) and accepts
    scalar or batched t; gated/hyper variants check their specific shapes."""
    from cfm_tpu.models.diffeq import (
        _CONV_LAYER_TYPES,
        ConvODEnet,
        GatedConv,
        GatedConvTranspose,
        GatedLinear,
        HyperConv2d,
    )

    x = jax.random.normal(key, (2, 8, 8, 3))
    t = jnp.array(0.3)
    for name, cls in _CONV_LAYER_TYPES.items():
        m = cls(out_channels=5)
        p = m.init(jax.random.fold_in(key, 1), t, x)
        y = m.apply(p, t, x)
        assert y.shape == (2, 8, 8, 5), (name, y.shape)
        yb = m.apply(p, jnp.full((2,), 0.3), x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yb), atol=1e-6)

    m = HyperConv2d(in_channels=3, out_channels=5)
    p = m.init(jax.random.fold_in(key, 2), t, x)
    assert m.apply(p, t, x).shape == (2, 8, 8, 5)
    # t must actually change the generated kernel.
    y1 = m.apply(p, jnp.array(0.1), x)
    y2 = m.apply(p, jnp.array(0.9), x)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))

    for cls in (GatedConv, GatedConvTranspose):
        m = cls(out_channels=5)
        p = m.init(jax.random.fold_in(key, 3), x)
        assert m.apply(p, x).shape == (2, 8, 8, 5)
    m = GatedLinear(out_dim=7)
    xx = jax.random.normal(key, (4, 3))
    p = m.init(jax.random.fold_in(key, 4), xx)
    assert m.apply(p, xx).shape == (4, 7)

    net = ConvODEnet(hidden_channels=(8, 8), out_channels=3)
    p = net.init(jax.random.fold_in(key, 5), t, x)
    assert net.apply(p, t, x).shape == x.shape


def test_diffeq_containers_and_resnet(key):
    """Containers/wrappers/resnet of the diffeq zoo (reference
    diffeq_layers/container.py, wrappers.py, resnet.py): sequential chains,
    time-weighted expert mixtures, flat<->image reshaping, and the
    pre-activation residual CNF drift net."""
    import flax.linen as nn

    from cfm_tpu.models.diffeq import (
        ConcatLinear,
        ConvODEnet,
        DiffEqWrapper,
        MixtureODELayer,
        ReshapeDiffEq,
        ResNetDiffEq,
        SequentialDiffEq,
        diffeq_wrap,
    )

    t = jnp.array(0.4)
    x = jax.random.normal(key, (3, 6))

    # DiffEqWrapper adapts a time-free module; Sequential chains mixed layers.
    seq = SequentialDiffEq(layers=(
        ConcatLinear(out_dim=8), diffeq_wrap(nn.Dense(6)),
    ))
    p = seq.init(key, t, x)
    y = seq.apply(p, t, x)
    assert y.shape == (3, 6)

    # Mixture: at the weight level the output is a t-weighted expert sum.
    mix = MixtureODELayer(experts=(
        ConcatLinear(out_dim=6), ConcatLinear(out_dim=6), ConcatLinear(out_dim=6),
    ))
    p = mix.init(key, t, x)
    assert mix.apply(p, t, x).shape == (3, 6)

    # ReshapeDiffEq: flat state through an image drift net and back.
    img_net = ConvODEnet(hidden_channels=(4,), out_channels=2)
    rs = ReshapeDiffEq(input_shape=(4, 4, 2), net=img_net)
    xf = jax.random.normal(key, (3, 32))
    p = rs.init(key, t, xf)
    assert rs.apply(p, t, xf).shape == (3, 32)

    # ResNet drift net: shape-preserving, residual (zero blocks ~ lift+proj).
    xi = jax.random.normal(key, (2, 8, 8, 3))
    net = ResNetDiffEq(dim=3, intermediate_dim=8, n_resblocks=2)
    p = net.init(key, t, xi)
    y = net.apply(p, t, xi)
    assert y.shape == (2, 8, 8, 3)
    yb = net.apply(p, jnp.full((2,), 0.4), xi)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yb), atol=1e-5)


def test_squeeze_layer_and_strided_convodenet(key):
    """SqueezeLayer round-trip (reference layers/squeeze.py) and the strided
    ConvODEnet (odefunc.py ODEnet conv mode with strides / num_squeeze)."""
    from cfm_tpu.models.diffeq import ConvODEnet, SqueezeLayer, squeeze2d, unsqueeze2d

    x = jax.random.normal(key, (2, 8, 8, 3))
    sq = squeeze2d(x, 2)
    assert sq.shape == (2, 4, 4, 12)
    np.testing.assert_allclose(np.asarray(unsqueeze2d(sq, 2)), np.asarray(x))
    # channel semantics: squeeze gathers each 2x2 spatial patch into channels
    np.testing.assert_allclose(np.asarray(sq[0, 0, 0, :3]), np.asarray(x[0, 0, 0]))

    layer = SqueezeLayer(downscale_factor=2)
    y, logp = layer(x, jnp.zeros((2,)))
    assert y.shape == (2, 4, 4, 12) and logp.shape == (2,)   # |det J| = 1
    back = layer(y, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    # Hourglass drift net: down(2) -> up(-2) -> 1, shape-preserving. With
    # num_squeeze the stack sees the squeezed tensor, so the last layer must
    # produce c*r^2 channels for the trailing depth-to-space to invert
    # (same constraint as the reference's ODEnet, odefunc.py:87,134-148).
    t = jnp.array(0.2)
    net = ConvODEnet(hidden_channels=(6, 6), out_channels=12,
                     strides=(2, -2, 1), num_squeeze=1)
    p = net.init(key, t, x)
    out = net.apply(p, t, x)
    assert out.shape == x.shape

    # And without squeezing: plain strided hourglass back to input channels.
    net2 = ConvODEnet(hidden_channels=(6, 6), out_channels=3, strides=(2, -2, 1))
    p2 = net2.init(key, t, x)
    assert net2.apply(p2, t, x).shape == x.shape


def test_autoencoder_diffeq_net(key):
    """AutoencoderDiffEqNet (reference odefunc.py:150-258): returns the
    encoder bottleneck h and the drift dx, both in linear and conv modes."""
    from cfm_tpu.models.diffeq import AutoencoderDiffEqNet

    t = jnp.array(0.5)
    x = jax.random.normal(key, (3, 6))
    net = AutoencoderDiffEqNet(hidden_dims=(8, 4, 8), out_dim=6,
                               layer_type="concat")
    p = net.init(key, t, x)
    h, dx = net.apply(p, t, x)
    assert h.shape == (3, 4) and dx.shape == (3, 6)   # bottleneck after 2 enc layers

    xi = jax.random.normal(key, (2, 8, 8, 3))
    netc = AutoencoderDiffEqNet(hidden_dims=(6, 4, 6), out_dim=3, conv=True,
                                layer_type="concat", strides=(1, 2, -2, 1))
    p = netc.init(key, t, xi)
    h, dx = netc.apply(p, t, xi)
    assert h.shape == (2, 4, 4, 4) and dx.shape == (2, 8, 8, 3)


def test_fused_attention_vmem_gate():
    """The Pallas gate must bound per-cell VMEM residency, not just tile
    alignment: H=32, S=1024, D=64 bf16 is alignment-legal but needs ~30 MB
    per grid cell and would fail Mosaic compilation on hardware."""
    from cfm_tpu.ops import pallas_attention as pa

    old = pa.INTERPRET
    pa.INTERPRET = True  # make backend check pass everywhere
    try:
        small = jax.ShapeDtypeStruct((2, 256, 3, 4, 64), jnp.bfloat16)
        big = jax.ShapeDtypeStruct((1, 1024, 3, 32, 64), jnp.bfloat16)
        assert pa._use_pallas(small)
        assert not pa._use_pallas(big)
        assert pa._vmem_bytes(32, 1024, 64, 2) > pa._VMEM_BUDGET_BYTES
        # The oversized shape still computes correctly via the XLA fallback.
        qkv = _rand_qkv(jax.random.PRNGKey(0), 1, 256, 64, 64, jnp.bfloat16)
        assert not pa._use_pallas(qkv)
        out = pa.fused_attention(qkv, 0.125)
        ref = pa._attn_reference(qkv, 0.125)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-2)
    finally:
        pa.INTERPRET = old


def test_attention_block_equals_dense_composition(key):
    """The einsum-projection AttentionBlock (kernel-layout qkv, VERDICT r2
    task 6) must compute exactly the nn.Dense(3c) -> attention -> nn.Dense(c)
    composition it replaced, with the kernels reshaped."""
    from cfm_tpu.models.unet import AttentionBlock, GroupNorm32
    from cfm_tpu.ops import pallas_attention as pa

    n, h, w, c, heads = 2, 8, 8, 32, 4
    hd = c // heads
    blk = AttentionBlock(num_heads=heads, dtype=jnp.float32)
    x = jax.random.normal(key, (n, h, w, c))
    params = blk.init(jax.random.fold_in(key, 1), x)
    out = blk.apply(params, x)

    p = params["params"]
    gn = GroupNorm32()
    tokens = gn.apply({"params": p["GroupNorm32_0"]}, x).reshape(n, h * w, c)
    wq = np.asarray(p["qkv_kernel"]).reshape(c, 3 * c)
    bq = np.asarray(p["qkv_bias"]).reshape(3 * c)
    qkv = tokens @ wq + bq
    qkv5 = qkv.reshape(n, h * w, 3, heads, hd)
    att = pa._attn_reference(jnp.asarray(qkv5), 1.0 / np.sqrt(hd))
    wo = np.asarray(p["proj_kernel"]).reshape(heads * hd, c)
    bo = np.asarray(p["proj_bias"])
    ref = x + (np.asarray(att).reshape(n, h * w, heads * hd) @ wo + bo).reshape(
        n, h, w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # proj is zero-initialized -> the block starts as identity.
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_attention_t_matches_layouts(key, dtype):
    """fused_attention_t == fused_attention modulo layout, fwd and grad."""
    from cfm_tpu.ops import pallas_attention as pa

    qkv = _rand_qkv(key, 2, 256, 2, 64, dtype)
    qkv_t = qkv.transpose(0, 2, 3, 1, 4)
    scale = 0.125
    # bf16 tolerance: the two layouts contract the einsums in different
    # orders, so low-bit rounding differs even for the same math.
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    a = pa.fused_attention(qkv, scale)                       # (N, S, H, D)
    b = pa.fused_attention_t(qkv_t, scale)                   # (N, H, S, D)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b.transpose(0, 2, 1, 3), np.float32),
                               atol=tol)
    g1 = jax.grad(lambda q: jnp.sum(jnp.sin(pa.fused_attention(q, scale))))(qkv)
    g2 = jax.grad(lambda q: jnp.sum(jnp.sin(pa.fused_attention_t(q, scale))))(qkv_t)
    np.testing.assert_allclose(np.asarray(g1, np.float32),
                               np.asarray(g2.transpose(0, 3, 1, 2, 4), np.float32),
                               atol=tol * 10)


# ---------------------------------------------------------------------------
# Torch-mirror numeric parity for the previously-unexecuted UNet surfaces
# (EncoderUNetModel all pool modes, SuperResModel, AttentionPool2d) —
# VERDICT r3 item 1. Identical randomized weights drive the flax module and
# an independent torch re-implementation (tests/helpers/torch_unet_mirror.py)
# of the reference semantics (torchcfm/models/unet/unet.py:23-50,635-852).
# ---------------------------------------------------------------------------


def _randomize(params, key, scale=0.2):
    """Replace every param leaf (incl. zero-inits) with random normals so
    parity errors in zero-initialized convs are visible."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.normal(k, l.shape, jnp.float32) * scale
         for k, l in zip(keys, leaves)],
    )


_ENC_CFG = dict(
    in_channels=3, model_channels=8, out_channels=5, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=4,
)


def _torch_mirror():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
    import torch_unet_mirror
    return torch_unet_mirror


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_encoder_unet_matches_torch_mirror(key, pool):
    import torch
    from cfm_tpu.models import EncoderUNetModel

    tm = _torch_mirror()
    m = EncoderUNetModel(pool=pool, **_ENC_CFG)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 8, 8, 3))
    t = jnp.array([0.25, 0.75])
    params = m.init(jax.random.PRNGKey(0), t, x)["params"]
    params = _randomize(params, k2)
    out = m.apply({"params": params}, t, x)
    assert out.shape == (2, 5)
    cfg = dict(_ENC_CFG, pool=pool)
    ref = tm.encoder_forward(params, cfg, torch.tensor([0.25, 0.75]),
                             torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_scale_shift_norm", [False, True])
def test_unet_matches_torch_mirror(key, use_scale_shift_norm):
    """Full UNetModel (down + mid + up, attention, class-cond) vs the torch
    mirror — pins the flagship trunk numerics end to end."""
    import torch
    from cfm_tpu.models import UNetModel

    tm = _torch_mirror()
    cfg = dict(
        in_channels=3, model_channels=8, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=4,
        num_classes=4, use_scale_shift_norm=use_scale_shift_norm,
    )
    m = UNetModel(**cfg)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 3))
    t = jnp.array([0.1, 0.9])
    y = jnp.array([1, 3])
    params = m.init(jax.random.PRNGKey(0), t, x, y)["params"]
    params = _randomize(params, k2)
    out = m.apply({"params": params}, t, x, y)
    assert out.shape == (2, 8, 8, 3)
    ref = tm.unet_forward(params, cfg, torch.tensor([0.1, 0.9]),
                          torch.from_numpy(np.asarray(x)),
                          torch.tensor([1, 3]))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_superres_matches_torch_mirror(key):
    import torch
    from cfm_tpu.models import SuperResModel, UNetModel

    tm = _torch_mirror()
    cfg = dict(
        in_channels=6, model_channels=8, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=4,
    )
    m = SuperResModel(base=UNetModel(**cfg))
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 8, 8, 3))
    low = jax.random.normal(k2, (2, 4, 4, 3))
    t = jnp.array([0.3, 0.6])
    params = m.init(jax.random.PRNGKey(0), t, x, low)["params"]
    params = _randomize(params, k3)
    out = m.apply({"params": params}, t, x, low)
    assert out.shape == (2, 8, 8, 3)
    ref = tm.superres_forward(params, cfg, torch.tensor([0.3, 0.6]),
                              torch.from_numpy(np.asarray(x)),
                              torch.from_numpy(np.asarray(low)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_attention_pool2d_matches_torch_mirror(key):
    import torch
    from cfm_tpu.models import AttentionPool2d

    tm = _torch_mirror()
    m = AttentionPool2d(embed_dim=16, num_heads=4, output_dim=6)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (3, 4, 4, 16))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    params = _randomize(params, k2)
    out = m.apply({"params": params}, x)
    assert out.shape == (3, 6)
    ref = tm.attention_pool2d(params, torch.from_numpy(np.asarray(x)), 4)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_encoder_unet_bf16_and_gradients(key):
    """bf16 torso smoke + gradient flow for the encoder (all-pool grads are
    finite and nonzero through attention pooling)."""
    from cfm_tpu.models import EncoderUNetModel

    m16 = EncoderUNetModel(pool="attention", dtype=jnp.bfloat16, **_ENC_CFG)
    x = jax.random.normal(key, (2, 8, 8, 3))
    t = jnp.array([0.5, 0.5])
    params = m16.init(jax.random.PRNGKey(0), t, x)["params"]
    out = m16.apply({"params": params}, t, x)
    assert out.shape == (2, 5) and np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.sum(m16.apply({"params": p}, t, x) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in flat)


# ---------------------------------------------------------------------------
# Fully-fused AttentionBlock kernel (ops/pallas_attn_block.py, round 4):
# the composition path is the numerics oracle — forward AND all gradients.
# ---------------------------------------------------------------------------


def _attn_block_paths(dtype, interpret, hw=16, c=128):
    """Returns (apply_fused, apply_composed, params, x) on a gate-passing
    shape (default S=256, C=128, heads=2 -> D=64)."""
    from cfm_tpu.models.unet import AttentionBlock
    from cfm_tpu.ops import pallas_attn_block as pab

    m = AttentionBlock(num_heads=c // 64, dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, hw, hw, c), dtype)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    # Randomize the zero-init out-projection so its gradient path is live.
    params = jax.tree_util.tree_map(
        lambda l: l + 0.05 * jax.random.normal(jax.random.PRNGKey(2), l.shape, l.dtype),
        params)

    def run(fused):
        def f(p, xx):
            # Flags are scoped by the _attn_block_flags fixture/context in
            # each test (the custom-vjp backward traces AFTER this returns,
            # so the flag must stay set for the whole grad computation).
            pab.INTERPRET = interpret
            pab.ENABLED = fused
            return m.apply({"params": p}, xx)
        return f

    return run(True), run(False), params, x


class _attn_block_flags:
    """Restore the pallas_attn_block routing flags on exit."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        from cfm_tpu.ops import pallas_attn_block as pab
        pab.INTERPRET = False
        pab.ENABLED = True


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-4), (jnp.bfloat16, 3e-2)])
def test_fused_attn_block_interpret_matches_composition(dtype, tol):
    from cfm_tpu.ops import pallas_attn_block as pab

    fused, composed, params, x = _attn_block_paths(dtype, interpret=True)
    with _attn_block_flags():
        _run_attn_block_parity(fused, composed, params, x, tol)


def _run_attn_block_parity(fused, composed, params, x, tol):
    y_f = fused(params, x)
    y_c = composed(params, x)
    np.testing.assert_allclose(np.asarray(y_f, np.float32),
                               np.asarray(y_c, np.float32), atol=tol, rtol=tol)

    def loss(f):
        def inner(p, xx):
            return jnp.sum(jnp.sin(f(p, xx).astype(jnp.float32)))
        return inner

    (gp_f, gx_f) = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    (gp_c, gx_c) = jax.grad(loss(composed), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_f, np.float32),
                               np.asarray(gx_c, np.float32), atol=tol * 5, rtol=tol * 5)
    paths_f = jax.tree_util.tree_leaves_with_path(gp_f)
    paths_c = jax.tree_util.tree_leaves_with_path(gp_c)
    for (kf, lf), (kc, lc) in zip(paths_f, paths_c):
        assert jax.tree_util.keystr(kf) == jax.tree_util.keystr(kc)
        np.testing.assert_allclose(
            np.asarray(lf, np.float32), np.asarray(lc, np.float32),
            atol=tol * 10, rtol=tol * 10,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(kf)}",
        )


def test_fused_attn_block_on_tpu():
    """Hardware run of the fused block kernel fwd+bwd (CFM_TPU_HW=1;
    interpret mode cannot check Mosaic legality/VMEM).

    Compares Mosaic against the INTERPRETER on the identical kernel — the
    same function with the same rounding points, so tolerances stay tight.
    (Cross-path bf16 comparison vs the composition is intentionally NOT
    asserted on hardware: the two paths round y at different points — the
    composition rounds the out-projection to bf16 before the residual add —
    so their bf16 gradients legitimately diverge; the f32 interpret test
    proves the math against the composition at 2e-4.)"""
    if jax.default_backend() == "cpu":
        pytest.skip("fused attention block kernel needs a TPU backend")
    # f32: Mosaic vs the composition. The math proof is the CPU-interpret
    # f32 test at 2e-4; on TPU the composition's default-precision einsums
    # run bf16 MXU passes while the kernel's dot_generals run full f32, so
    # the cross-path tolerance here covers that precision-config gap and
    # the assertion validates Mosaic compilation + grad plumbing.
    fused, composed, params, x = _attn_block_paths(jnp.float32, interpret=False)
    with _attn_block_flags():
        _run_attn_block_parity(fused, composed, params, x, 2e-2)
    # 8x8 map (S=64): the widened sublane-only S gate, on hardware.
    fused64, composed64, params64, x64 = _attn_block_paths(
        jnp.float32, interpret=False, hw=8, c=256)
    from cfm_tpu.ops import pallas_attn_block as pab
    assert pab.use_fused_block(64, 256, 4, jnp.float32)
    with _attn_block_flags():
        _run_attn_block_parity(fused64, composed64, params64, x64, 2e-2)
    # bf16: loose cross-path agreement + finiteness (bf16 grads legitimately
    # diverge between paths/ULP flips; see the interpret test docstring).
    fused16, composed16, params16, x16 = _attn_block_paths(jnp.bfloat16,
                                                           interpret=False)
    with _attn_block_flags():
        y_f = fused16(params16, x16)
        y_c = composed16(params16, x16)
        np.testing.assert_allclose(np.asarray(y_f, np.float32),
                                   np.asarray(y_c, np.float32),
                                   atol=3e-2, rtol=3e-2)
        g = jax.grad(lambda p, xx: jnp.sum(
            jnp.sin(fused16(p, xx).astype(jnp.float32))), argnums=(0, 1)
        )(params16, x16)
        for l in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(l, np.float32)).all()


def test_encoder_unet_resblock_updown_matches_torch_mirror(key):
    """resblock_updown + conv_resample=False paths of the encoder (the last
    unexecuted ResBlock down-resampling branch) vs the torch mirror."""
    import torch
    from cfm_tpu.models import EncoderUNetModel

    tm = _torch_mirror()
    cfg = dict(_ENC_CFG, pool="adaptive", resblock_updown=True,
               use_scale_shift_norm=True)
    m = EncoderUNetModel(**cfg)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 3))
    t = jnp.array([0.4, 0.6])
    params = _randomize(m.init(jax.random.PRNGKey(0), t, x)["params"], k2)
    out = m.apply({"params": params}, t, x)
    ref = tm.encoder_forward(params, cfg, torch.tensor([0.4, 0.6]),
                             torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_unet_resblock_updown_matches_torch_mirror(key):
    """Full UNet with ResBlock up/down resampling (up path included)."""
    import torch
    from cfm_tpu.models import UNetModel

    tm = _torch_mirror()
    cfg = dict(
        in_channels=3, model_channels=8, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=4,
        resblock_updown=True,
    )
    m = UNetModel(**cfg)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 8, 8, 3))
    t = jnp.array([0.2, 0.8])
    params = _randomize(m.init(jax.random.PRNGKey(0), t, x)["params"], k2)
    out = m.apply({"params": params}, t, x)
    ref = tm.unet_forward(params, cfg, torch.tensor([0.2, 0.8]),
                          torch.from_numpy(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_fast_dropout_semantics():
    """u8-draw dropout: torch nn.Dropout semantics with the keep probability
    quantized to thr/256 and the rescale matched to the REALIZED probability
    (exactly unbiased). Reference site: unet.py:130-234 ResBlock dropout."""
    from cfm_tpu.models.unet import FastDropout

    x = jnp.ones((64, 16, 16, 32), jnp.float32)
    mod = FastDropout(0.1)
    out = mod.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    kept = np.asarray(out) != 0.0
    # Realized keep prob is round(0.9*256)/256 = 230/256.
    np.testing.assert_allclose(kept.mean(), 230 / 256, atol=0.005)
    # Kept activations carry the exactly-matching rescale -> unbiased.
    np.testing.assert_allclose(np.asarray(out)[kept], 256 / 230, rtol=1e-6)
    np.testing.assert_allclose(float(out.mean()), 1.0, atol=0.01)
    # Same rng -> same mask; different rng -> different mask.
    out2 = mod.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = mod.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.array_equal(np.asarray(out), np.asarray(out3))
    # deterministic / rate edges are identity / zeros.
    np.testing.assert_array_equal(np.asarray(mod.apply({}, x, True)), np.asarray(x))
    z = FastDropout(1.0).apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(z), 0.0)
    i = FastDropout(0.0).apply({}, x, False)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(x))
    # bf16 activations keep their dtype.
    xb = x.astype(jnp.bfloat16)
    ob = mod.apply({}, xb, False, rngs={"dropout": jax.random.PRNGKey(0)})
    assert ob.dtype == jnp.bfloat16


def test_fast_dropout_tiny_rates_never_silent_noop():
    """Any nonzero rate < 1 drops something; any rate < 1 keeps something —
    the u8 quantization clamps one level off the edges (review finding r5)."""
    from cfm_tpu.models.unet import FastDropout

    x = jnp.ones((32, 32, 32), jnp.float32)
    out = FastDropout(0.001).apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    frac = float((np.asarray(out) == 0).mean())
    np.testing.assert_allclose(frac, 1 / 256, atol=0.002)  # smallest drop level
    out = FastDropout(0.999).apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    frac = float((np.asarray(out) != 0).mean())
    np.testing.assert_allclose(frac, 1 / 256, atol=0.002)  # smallest keep level
