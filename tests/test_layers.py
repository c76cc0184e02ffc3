"""Decoder building blocks: value parity with torch oracles where the
reference math is unambiguous, shape/masking invariants elsewhere."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from rvos_tpu.models.layers import (
    GCT,
    ConditioningBlock,
    ConditioningLayer,
    DynamicPreHead,
    GNASPP,
    GNBottleneck,
    IAGate,
)


def test_gct_matches_torch_formula(rng):
    o, h, w, c = 2, 5, 6, 8
    x = rng.standard_normal((o, h, w, c)).astype(np.float32)
    m = GCT(c)
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize params
    alpha = rng.standard_normal((1, 1, 1, c)).astype(np.float32)
    gamma = rng.standard_normal((1, 1, 1, c)).astype(np.float32)
    beta = rng.standard_normal((1, 1, 1, c)).astype(np.float32)
    var = {"params": {"alpha": jnp.asarray(alpha), "gamma": jnp.asarray(gamma),
                      "beta": jnp.asarray(beta)}}
    got = np.asarray(m.apply(var, jnp.asarray(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    a = torch.from_numpy(alpha).permute(0, 3, 1, 2)
    g = torch.from_numpy(gamma).permute(0, 3, 1, 2)
    b = torch.from_numpy(beta).permute(0, 3, 1, 2)
    eps = 1e-5
    embedding = (xt.pow(2).sum((2, 3), keepdim=True) + eps).pow(0.5) * a
    norm = g / (embedding.pow(2).mean(dim=1, keepdim=True) + eps).pow(0.5)
    want = (xt * (1.0 + torch.tanh(embedding * norm + b))).permute(0, 2, 3, 1)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-4)


def test_ia_gate_shapes(rng):
    x = jnp.asarray(rng.standard_normal((3, 4, 5, 16)).astype(np.float32))
    head = jnp.asarray(rng.standard_normal((3, 40)).astype(np.float32))
    m = IAGate(16)
    var = m.init(jax.random.PRNGKey(0), x, head)
    y = m.apply(var, x, head)
    assert y.shape == x.shape


def test_bottleneck_stride_and_dims(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 256)).astype(np.float32))
    m = GNBottleneck(256, 512, stride=2, dilation=1)      # ref layer3
    var = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(var, x)
    assert y.shape == (2, 4, 4, 512)
    m2 = GNBottleneck(256, 256, stride=1, dilation=2)     # ref layer2
    var2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(var2, x).shape == (2, 8, 8, 256)


def test_gnaspp_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 512)).astype(np.float32))
    m = GNASPP(512)
    var = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(var, x)
    assert y.shape == (2, 7, 9, 256)


def test_conditioning_layer_topk_mask(rng):
    """Strict top-β masked GAP divided by full support (ref :42-43)."""
    o, h, w, c = 1, 4, 5, 6
    x = rng.standard_normal((o, h, w, c)).astype(np.float32)
    m = ConditioningLayer(c, beta_percentage=0.3)
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(var, jnp.asarray(x)))
    # oracle with the module's own params
    pw = np.asarray(var["params"]["phi_layer"]["kernel"]).reshape(c, 1)
    pb = np.asarray(var["params"]["phi_layer"]["bias"])
    mw = np.asarray(var["params"]["mlp_layer"]["kernel"])
    mb = np.asarray(var["params"]["mlp_layer"]["bias"])
    phi = x.reshape(o, h * w, c) @ pw + pb                   # [O, HW, 1]
    k = max(1, int(0.3 * h * w))
    kth = np.sort(phi[:, :, 0], axis=1)[:, -k][:, None]
    mask = (phi[:, :, 0] > kth).astype(np.float32)
    pooled = (x.reshape(o, h * w, c) * mask[..., None]).sum(1) / (h * w)
    want = pooled @ mw + mb
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conditioning_block_gates(rng):
    o, h, w, c = 3, 6, 6, 16
    x = jnp.asarray(rng.standard_normal((o, h, w, c)).astype(np.float32))
    head = jnp.asarray(rng.standard_normal((o, 40)).astype(np.float32))
    valid = jnp.asarray(np.array([1.0, 1.0, 0.0], np.float32))
    m = ConditioningBlock(c, proxy_dim=40)
    var = m.init(jax.random.PRNGKey(0), x, head, valid)
    y = m.apply(var, x, head, valid)
    assert y.shape == x.shape
    # gate is bounded in (0, 2): |y| <= 2|x|
    assert np.all(np.abs(np.asarray(y)) <= 2.0 * np.abs(np.asarray(x)) + 1e-6)


def test_prehead_shapes(rng):
    x = jnp.asarray(rng.standard_normal((4, 6, 7, 17)).astype(np.float32))
    m = DynamicPreHead(64)
    var = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(var, x).shape == (4, 6, 7, 64)


def test_gn_matches_flax_groupnorm(rng):
    """The folded-affine GN must equal nn.GroupNorm exactly in f32 and
    keep bf16 towers bf16 (the f32-materialization fix)."""
    import flax.linen as nn
    from rvos_tpu.models.layers import GN

    x = jnp.asarray(rng.standard_normal((3, 7, 5, 64)).astype(np.float32)) * 3
    gn = GN(num_groups=16)
    ref = nn.GroupNorm(num_groups=16, epsilon=1e-5)
    v = gn.init(jax.random.PRNGKey(0), x)
    # non-trivial affine
    v = {"params": {"scale": jnp.asarray(
            rng.standard_normal(64).astype(np.float32)),
         "bias": jnp.asarray(rng.standard_normal(64).astype(np.float32))}}
    got = gn.apply(v, x)
    want = ref.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    xb = x.astype(jnp.bfloat16)
    vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
    out = gn.apply(vb, xb)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.1)


def test_shiftconv_matches_nn_conv(rng):
    """ShiftConv3x3 is param-compatible with nn.Conv(f,(3,3)) (same
    'kernel' [3,3,Cin,Cout]) and numerically equivalent for stride-1
    dilated convs — the torch-weight converter must keep working."""
    import flax.linen as nn
    from rvos_tpu.models.layers import ShiftConv3x3
    for dil in (1, 2):
        x = jnp.asarray(rng.standard_normal((2, 9, 11, 6)).astype(np.float32))
        sc = ShiftConv3x3(8, dil)
        v = sc.init(jax.random.PRNGKey(0), x)
        ref = nn.Conv(8, (3, 3), kernel_dilation=(dil, dil), padding=dil,
                      use_bias=False)
        got = sc.apply(v, x)
        want = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


def test_gn_gct_bf16_fast_path_tolerance(rng):
    """The bf16 statistics fast paths (squares in bf16, f32 accumulation,
    E[x²]−E[x]² variance) must stay within bf16 rounding of the exact
    f32 path."""
    from rvos_tpu.models.layers import GN, GCT
    x = rng.standard_normal((3, 7, 5, 32)).astype(np.float32) * 2.0 + 0.5
    gn = GN(num_groups=8)
    v = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    exact = np.asarray(gn.apply(v, jnp.asarray(x)))
    fast = np.asarray(gn.apply(v, jnp.asarray(x, jnp.bfloat16))
                      .astype(jnp.float32))
    np.testing.assert_allclose(fast, exact, atol=0.15, rtol=0.05)

    gct = GCT(32)
    vg = gct.init(jax.random.PRNGKey(1), jnp.asarray(x))
    exact_g = np.asarray(gct.apply(vg, jnp.asarray(x)))
    fast_g = np.asarray(gct.apply(vg, jnp.asarray(x, jnp.bfloat16))
                        .astype(jnp.float32))
    np.testing.assert_allclose(fast_g, exact_g, atol=0.15, rtol=0.05)


def test_space_to_depth_conv2_matches_strided_conv(rng):
    """SpaceToDepthConv2 (packed shifted matmuls) is param-compatible
    with nn.Conv(f,(K,K),strides=2,padding=K//2) and numerically
    equivalent — odd AND even spatial sizes, K=7 (stem) and K=3
    (stride-2 bottlenecks)."""
    import flax.linen as nn
    from rvos_tpu.models.layers import SpaceToDepthConv2
    for k, (h, w) in [(7, (17, 21)), (7, (16, 20)), (3, (9, 12)),
                      (3, (10, 11))]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 5)).astype(np.float32))
        sc = SpaceToDepthConv2(8, k)
        v = sc.init(jax.random.PRNGKey(0), x)
        ref = nn.Conv(8, (k, k), strides=(2, 2), padding=k // 2,
                      use_bias=False)
        got = sc.apply(v, x)
        want = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        assert got.shape == want.shape, (k, h, w, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-5)


def test_conv1x1_stride2_matches_strided_conv(rng):
    import flax.linen as nn
    from rvos_tpu.models.layers import Conv1x1Stride2
    for h, w in [(9, 12), (10, 11)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 6)).astype(np.float32))
        sc = Conv1x1Stride2(8)
        v = sc.init(jax.random.PRNGKey(0), x)
        ref = nn.Conv(8, (1, 1), strides=(2, 2), use_bias=False)
        got = sc.apply(v, x)
        want = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)
