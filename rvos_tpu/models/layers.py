"""Decoder-side building blocks (flax.linen, NHWC).

Ports of the reference's intended semantics with the release defects of
SURVEY.md §2.9 fixed:

* ``GCT`` / ``GNBottleneck`` — gated channel transform and the
  GroupNorm bottleneck residual block (``networks/layers/gct.py:7-91``;
  the dead ``SpatialProp`` import dropped).
* ``IAGate`` — instance-attention channel gate
  (``networks/layers/attention.py:7-17``).
* ``GNASPP`` — the GroupNorm/GCT ASPP used inside the calibration
  decoder (``networks/layers/aspp.py:33-78``, 512→640→256).
* ``ConditioningLayer`` / ``ConditioningBlock`` — Eq.(7)/Eq.(5) of the
  paper (``networks/aoc/conditioning_layer.py:6-87``).  The released
  forward calls its own sublayers without ``self.`` and feeds vector
  inputs into Conv2d saliency (§2.9); the reconstruction here: spatial
  inputs use saliency top-β masking + GAP + MLP, vector inputs (the
  inter-object delta and the β=1 proxy head) degenerate to the MLP —
  Eq.(7) with a singleton spatial support.
* ``DynamicPreHead`` — 1×1 conv + GN + ReLU over the stacked distance
  maps (``networks/aoc/decoding_module.py:228-240``).

All spatial tensors are [O, H, W, C] — the object axis rides the batch
dim exactly like the reference's per-object decoding.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ShiftConv3x3(nn.Module):
    """3×3 dilated conv as nine shifted 1×1 matmuls (param-compatible
    with ``nn.Conv(features, (3,3))`` — one ``kernel`` [3,3,Cin,Cout]).

    XLA:TPU schedules the ASPP's dilated 2048→256 convs at batch 1 as a
    row-sliced loop (~4% MXU, 0.5 ms each in the 480p eval profile); the
    same FLOPs as nine [H·W, Cin]×[Cin, Cout] matmuls run near MXU
    speed.  Output accumulates in f32 and is cast back to the input
    dtype.
    """
    features: int
    dilation: int = 1
    kernel_init: Any = nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal", in_axis=(0, 1, 2))

    @nn.compact
    def __call__(self, x):  # [N, H, W, Cin]
        c_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, c_in, self.features))
        d = self.dilation
        n, h, w, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        k = kernel.astype(x.dtype)
        # each tap's matmul accumulates f32 inside the MXU and emits the
        # input dtype — forcing f32 partials (preferred_element_type) or
        # one stacked [9,N,H,W,C] contraction both materialize far more
        # HBM traffic (measured +2-4 ms/frame at decoder resolution)
        out = None
        for dy in range(3):
            for dx in range(3):
                piece = jax.lax.slice(
                    xp, (0, dy * d, dx * d, 0),
                    (n, dy * d + h, dx * d + w, c_in))
                term = jnp.einsum("nhwc,cf->nhwf", piece, k[dy, dx])
                out = term if out is None else out + term
        return out



class SpaceToDepthConv2(nn.Module):
    """Stride-2 K×K conv as ⌈K/2⌉² shifted matmuls on a 2×2-packed
    (space-to-depth) input — param-compatible with
    ``nn.Conv(features, (K,K), strides=2, padding=K//2)``.

    XLA:TPU lowers batch≤4 stride-2 NHWC convs through space-to-batch
    bookkeeping; packing 2×2 pixel blocks into channels makes the
    stride-2 conv a stride-1 ⌈K/2⌉×⌈K/2⌉ conv over [H/2, W/2, 4C],
    expressed as shifted [M, 4C]×[4C, F] matmuls exactly like
    ``ShiftConv3x3``.

    Used for the decoder tower's object-batched stride-2 conv
    (``GNBottleneck`` layer3: batch=O≤4, 256→512ch) where it measured
    30.21 vs 30.50 ms/frame at 480p eval.  NOT used in the ResNet
    backbone: the batch-1 stem (c_in=3) and the three stride-2
    bottlenecks measured *slower* with it (30.77 / 31.35 ms — the
    packing reshape+transpose and skinnier matmuls cost more than the
    space-to-batch copies they replace at those shapes; r3 A/B ladder
    in ROUND_NOTES).

        out[i,j] = Σ_{a,b} y[i+a, j+b] · k2[a,b],
        y[u,v,(p,q,c)] = x_pad[2u+p, 2v+q, c],
        k2[a,b,(p,q,c),f] = k[2a+p, 2b+q, c, f]   (zero where ≥ K).
    """
    features: int
    kernel_size: int = 3          # odd
    kernel_init: Any = nn.initializers.kaiming_normal()

    @nn.compact
    def __call__(self, x):  # [N, H, W, Cin]
        k = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, c_in, self.features))
        n, h, w, _ = x.shape
        ho, wo = (h + 1) // 2, (w + 1) // 2
        a_t = (k + 1) // 2
        pad_l = k // 2

        def pad_r(size, out):
            # padded length: even, ≥ 2·(out−1) + k from offset pad_l
            need = 2 * out + k - 2
            pr = need - size - pad_l
            if (pad_l + size + pr) % 2:
                pr += 1
            return pr

        xp = jnp.pad(x, ((0, 0), (pad_l, pad_r(h, ho)),
                         (pad_l, pad_r(w, wo)), (0, 0)))
        hp, wp = xp.shape[1], xp.shape[2]
        y = xp.reshape(n, hp // 2, 2, wp // 2, 2, c_in)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
        y = y.reshape(n, hp // 2, wp // 2, 4 * c_in)

        kp = jnp.pad(kernel, ((0, 2 * a_t - k), (0, 2 * a_t - k),
                              (0, 0), (0, 0))).astype(x.dtype)
        k2 = kp.reshape(a_t, 2, a_t, 2, c_in, self.features)
        k2 = jnp.transpose(k2, (0, 2, 1, 3, 4, 5))
        k2 = k2.reshape(a_t, a_t, 4 * c_in, self.features)

        out = None
        for a in range(a_t):
            for b in range(a_t):
                piece = jax.lax.slice(y, (0, a, b, 0),
                                      (n, a + ho, b + wo, 4 * c_in))
                term = jnp.einsum("nhwc,cf->nhwf", piece, k2[a, b])
                out = term if out is None else out + term
        return out


class Conv1x1Stride2(nn.Module):
    """Stride-2 1×1 conv as slice + matmul — param-compatible with
    ``nn.Conv(features, (1,1), strides=2)`` (the ResNet downsample
    shortcuts); avoids the space-to-batch path entirely."""
    features: int
    kernel_init: Any = nn.initializers.kaiming_normal()

    @nn.compact
    def __call__(self, x):  # [N, H, W, Cin]
        c_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, c_in, self.features))
        xs = x[:, ::2, ::2, :]
        return jnp.einsum("nhwc,cf->nhwf", xs,
                          kernel[0, 0].astype(x.dtype))


class GN(nn.Module):
    """GroupNorm with a dtype-stable folded-affine apply.

    Param-compatible with ``nn.GroupNorm`` (``scale``/``bias`` of shape
    [C]) and numerically identical in f32.  flax's GroupNorm normalizes
    in f32 and casts only the final result, so under a bf16 eval tower
    XLA materializes the whole [O, H, W, C] activation in f32 (plus
    layout copies) before every conv — measured ~8-10 ms/frame at DAVIS
    480p.  Here the group statistics still accumulate in f32, but they
    fold into per-(batch, channel) vectors ``mul``/``off`` that are cast
    to the input dtype, so the only full-size elementwise op is one
    bf16 FMA that fuses with its neighbors.
    """
    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [..., C]
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        red_axes = tuple(range(1, x.ndim - 1))
        xg = x.reshape(x.shape[:-1] + (g, c // g))
        if x.dtype == jnp.bfloat16:
            # bf16 tower: two-stage statistics — bf16 partial sums over
            # the per-group channel axis (cg ≤ 8 terms, minor dim, fuses
            # into the producer), then f32 accumulation of the cg×
            # smaller partials.  A ``dtype=f32`` reduce over the full
            # activation makes XLA materialize the converted square
            # ([B,H,W,C] f32 + layout copies, ~2 ms/frame at 480p);
            # E[x²]−E[x]² cancellation is bounded by the bf16 rounding
            # already accepted on the squares.
            cg = c // g
            n_el = float(np.prod([x.shape[a] for a in red_axes]) * cg)
            s1 = jnp.sum(xg, axis=-1)                      # [B,*sp,G] bf16
            q1 = jnp.sum(jnp.square(xg), axis=-1)
            mean = (jnp.sum(s1, axis=red_axes, keepdims=True,
                            dtype=jnp.float32) / n_el)     # [B,1..,G]
            sq_mean = (jnp.sum(q1, axis=red_axes, keepdims=True,
                               dtype=jnp.float32) / n_el)
            var = jnp.maximum(sq_mean - jnp.square(mean), 0.0)
            mean = mean[..., None]
            var = var[..., None]
        else:
            xf = xg.astype(jnp.float32)
            mean = jnp.mean(xf, axis=red_axes + (x.ndim,), keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=red_axes + (x.ndim,),
                           keepdims=True)
        rstd = jax.lax.rsqrt(var + self.epsilon)          # [B,1..,G,1]
        # fold: y = x*(scale*rstd) + (bias - mean*scale*rstd)
        b = x.shape[0]
        mul_c = (jnp.broadcast_to(rstd, (b,) + (1,) * (x.ndim - 2) + (g, c // g))
                 .reshape(b, c) * scale[None].astype(jnp.float32))
        mean_c = (jnp.broadcast_to(mean, (b,) + (1,) * (x.ndim - 2) + (g, c // g))
                  .reshape(b, c))
        off_c = bias[None].astype(jnp.float32) - mean_c * mul_c
        shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        return (x * mul_c.astype(x.dtype).reshape(shape)
                + off_c.astype(x.dtype).reshape(shape))


class GCT(nn.Module):
    """Gated channel transform, l2 mode (gct.py:7-36)."""
    channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [O, H, W, C]
        alpha = self.param("alpha", nn.initializers.ones, (1, 1, 1, self.channels))
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.channels))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.channels))
        # gate statistics accumulate in f32; in a bf16 tower the squares
        # stay bf16 (the ``dtype=`` reduce fuses the convert — an
        # explicit f32 upcast materializes the whole activation in f32
        # with layout copies around the neighboring convs)
        if x.dtype == jnp.bfloat16:
            # two-stage: bf16 partial sums over 8-wide w-chunks (zero
            # padding leaves the sum unchanged), f32 accumulation of the
            # 8× smaller partials — same rationale as the GN fast path
            o_, h_, w_, c_ = x.shape
            wp = (-w_) % 8
            xq = jnp.square(x)
            if wp:
                xq = jnp.pad(xq, ((0, 0), (0, 0), (0, wp), (0, 0)))
            s1 = jnp.sum(xq.reshape(o_, h_, (w_ + wp) // 8, 8, c_), axis=3)
            sumsq = jnp.sum(s1, axis=(1, 2), keepdims=True,
                            dtype=jnp.float32)
        else:
            sumsq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                            keepdims=True)
        embedding = jnp.sqrt(sumsq + self.epsilon) * alpha.astype(jnp.float32)
        norm = gamma.astype(jnp.float32) / jnp.sqrt(
            jnp.mean(jnp.square(embedding), axis=-1, keepdims=True)
            + self.epsilon)
        gate = 1.0 + jnp.tanh(embedding * norm + beta.astype(jnp.float32))
        return x * gate.astype(x.dtype)


class GNBottleneck(nn.Module):
    """GCT-fronted GroupNorm bottleneck residual (gct.py:38-91)."""
    inplanes: int
    outplanes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        planes = self.outplanes // 4
        residual = x
        out = GCT(self.inplanes, name="GCT1")(x)
        out = nn.Conv(planes, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.kaiming_normal(),
                      name="conv1")(out)
        out = GN(num_groups=32, name="bn1", epsilon=1e-5)(out)
        out = nn.relu(out)
        if self.stride == 1:
            out = ShiftConv3x3(planes, self.dilation,
                               kernel_init=nn.initializers.kaiming_normal(),
                               name="conv2")(out)
        else:
            assert self.dilation == 1, "stride-2 blocks are dilation-1"
            out = SpaceToDepthConv2(planes, 3, name="conv2")(out)
        out = GN(num_groups=32, name="bn2", epsilon=1e-5)(out)
        out = nn.relu(out)
        out = nn.Conv(self.outplanes, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.kaiming_normal(),
                      name="conv3")(out)
        out = GN(num_groups=32, name="bn3", epsilon=1e-5)(out)
        if self.stride != 1 or self.inplanes != self.outplanes:
            if self.stride != 1:
                residual = Conv1x1Stride2(self.outplanes,
                                          name="downsample_conv")(x)
            else:
                residual = nn.Conv(
                    self.outplanes, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="downsample_conv")(x)
            residual = GN(num_groups=32, name="downsample_gn", epsilon=1e-5)(residual)
        return nn.relu(out + residual)


class IAGate(nn.Module):
    """x * (1 + tanh(Linear(head))) (attention.py:7-17)."""
    out_dim: int

    @nn.compact
    def __call__(self, x, head):  # x: [O, H, W, C]; head: [O, D]
        a = nn.Dense(self.out_dim, name="IA")(head)
        gate = 1.0 + jnp.tanh(a)
        return x * gate[:, None, None, :]


class _GNASPPModule(nn.Module):
    inplanes: int
    planes: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        x = GCT(self.inplanes, name="GCT")(x)
        if self.kernel_size == 3:
            x = ShiftConv3x3(self.planes, self.dilation,
                             kernel_init=nn.initializers.kaiming_normal(),
                             name="atrous_conv")(x)
        else:
            x = nn.Conv(self.planes, (self.kernel_size, self.kernel_size),
                        kernel_dilation=(self.dilation, self.dilation),
                        padding=0, use_bias=False,
                        kernel_init=nn.initializers.kaiming_normal(),
                        name="atrous_conv")(x)
        x = GN(num_groups=self.planes // 4, name="bn", epsilon=1e-5)(x)
        return nn.relu(x)


class GNASPP(nn.Module):
    """Calibration-decoder ASPP: 512-in, GN+GCT (layers/aspp.py:33-78)."""
    inplanes: int = 512

    @nn.compact
    def __call__(self, x):  # [O, H, W, 512]
        d = (1, 6, 12, 18)
        x1 = _GNASPPModule(self.inplanes, 128, 1, d[0], name="aspp1")(x)
        x2 = _GNASPPModule(self.inplanes, 128, 3, d[1], name="aspp2")(x)
        x3 = _GNASPPModule(self.inplanes, 128, 3, d[2], name="aspp3")(x)
        x4 = _GNASPPModule(self.inplanes, 128, 3, d[3], name="aspp4")(x)
        x5 = jnp.mean(x, axis=(1, 2), keepdims=True)
        x5 = nn.Conv(128, (1, 1), use_bias=False,
                     kernel_init=nn.initializers.kaiming_normal(),
                     name="global_conv")(x5)
        x5 = nn.relu(x5)
        x5 = jnp.broadcast_to(x5, x4.shape[:3] + (128,))
        x = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
        x = GCT(640, name="GCT")(x)
        x = nn.Conv(256, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="conv1")(x)
        x = GN(num_groups=32, name="bn1", epsilon=1e-5)(x)
        return nn.relu(x)


class ConditioningLayer(nn.Module):
    """Eq.(7): saliency top-β mask → GAP → MLP (conditioning_layer.py:6-48).

    Spatial input [O, H, W, C]: 1×1-conv saliency, strict top-β spatial
    mask, masked mean over the full H*W support (the reference's
    ``avg_pool1d`` divides by H*W, not by the mask count), then a Dense.
    Vector input [O, C]: the Eq.(7) degenerate case (singleton support)
    — Dense only.
    """
    in_dim: int
    beta_percentage: float = 0.3

    @nn.compact
    def __call__(self, z):
        if z.ndim == 2:  # vector conditioning code
            return nn.Dense(self.in_dim, name="mlp_layer")(z)
        o, h, w, c = z.shape
        phi = nn.Conv(1, (1, 1),
                      kernel_init=nn.initializers.kaiming_normal(),
                      name="phi_layer")(z)                    # [O, H, W, 1]
        phi_flat = phi.reshape(o, h * w)
        beta_rank = max(1, int(self.beta_percentage * h * w))
        # values-only unstable sort: jnp.sort defaults to a stable
        # tuple-sort that drags an s32 iota companion through the TPU
        # sort network — only the kth VALUE is needed here
        kth = jax.lax.sort(phi_flat, dimension=-1,
                           is_stable=False)[:, -beta_rank][:, None]
        mask = (phi_flat > kth).astype(z.dtype)               # strict >, ref :36
        z_flat = z.reshape(o, h * w, c)
        pooled = jnp.sum(z_flat * mask[..., None], axis=1) / (h * w)
        return nn.Dense(self.in_dim, name="mlp_layer")(pooled)


class ConditioningBlock(nn.Module):
    """Eq.(5): intra-object + inter-object + proxy codes → channel gate
    (conditioning_layer.py:50-87 with §2.9 wiring fixes)."""
    in_dim: int
    proxy_dim: int = 400
    beta_percentage: float = 0.3

    @nn.compact
    def __call__(self, x, proxy_head, obj_valid):
        # inter-object pooled delta over valid objects
        px = jnp.mean(x, axis=(1, 2))                         # [O, C]
        px = px * obj_valid[:, None]
        x_delta = jnp.sum(px, axis=0, keepdims=True) - px     # [O, C]

        cl1 = ConditioningLayer(self.in_dim, self.beta_percentage,
                                name="CL_1")(x)
        cl2 = ConditioningLayer(self.in_dim, self.beta_percentage,
                                name="CL_2")(x_delta)
        cl3 = ConditioningLayer(self.proxy_dim, 1.0, name="CL_3")(proxy_head)

        a = nn.Dense(self.in_dim, name="mlp_layer")(
            jnp.concatenate([cl1, cl2, cl3], axis=1))
        gate = 1.0 + jnp.tanh(a)
        return x * gate[:, None, None, :]


class DynamicPreHead(nn.Module):
    """1×1 conv + GN + ReLU over stacked distance maps
    (decoding_module.py:228-240)."""
    embed_dim: int = 64

    @nn.compact
    def __call__(self, x):  # [O, H, W, in_dim]
        x = nn.Conv(self.embed_dim, (1, 1),
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="conv")(x)
        x = GN(num_groups=self.embed_dim // 4, name="bn", epsilon=1e-5)(x)
        return nn.relu(x)
