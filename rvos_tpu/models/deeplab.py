"""DeepLabv3+ feature extractor (flax.linen, NHWC).

Reference: ``networks/deeplab/{deeplab,aspp,decoder}.py`` — ResNet-101
(OS=16) → ASPP (frozen-BN variant, 2048→1280→256) → decoder (low-level
256→48, concat 304 → two 3×3 convs → 256) at stride 4.  Returns the
256-channel decoder features plus the raw stride-4 low-level features,
exactly the pair AOCNet consumes (``aocnet.py:109-112``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_hw
from .layers import ShiftConv3x3
from .resnet import FrozenBatchNorm, ResNet101


class DeepLabASPP(nn.Module):
    """Backbone-side ASPP (aspp.py:30-74): frozen BN, dropout 0.1."""
    inplanes: int = 2048
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = (1, 6, 12, 18)

        def branch(x, ksize, dilation, name):
            if ksize == 3:
                y = ShiftConv3x3(256, dilation, name=f"{name}_conv")(x)
            else:
                y = nn.Conv(256, (ksize, ksize),
                            kernel_dilation=(dilation, dilation),
                            padding=0, use_bias=False,
                            name=f"{name}_conv")(x)
            y = FrozenBatchNorm(256, name=f"{name}_bn")(y)
            return nn.relu(y)

        x1 = branch(x, 1, d[0], "aspp1")
        x2 = branch(x, 3, d[1], "aspp2")
        x3 = branch(x, 3, d[2], "aspp3")
        x4 = branch(x, 3, d[3], "aspp4")
        x5 = jnp.mean(x, axis=(-3, -2), keepdims=True)
        x5 = nn.Conv(256, (1, 1), use_bias=False, name="gap_conv")(x5)
        x5 = FrozenBatchNorm(256, name="gap_bn")(x5)
        x5 = nn.relu(x5)
        x5 = jnp.broadcast_to(x5, x4.shape)
        x = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
        x = nn.Conv(256, (1, 1), use_bias=False, name="conv1")(x)
        x = FrozenBatchNorm(256, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x


class DeepLabDecoder(nn.Module):
    """Stride-4 decoder (decoder.py:6-49)."""

    @nn.compact
    def __call__(self, x, low_level):
        ll = nn.Conv(48, (1, 1), use_bias=False, name="conv1")(low_level)
        ll = FrozenBatchNorm(48, name="bn1")(ll)
        ll = nn.relu(ll)
        x = _batched_resize(x, ll.shape[-3:-1])
        x = jnp.concatenate([x, ll], axis=-1)
        x = ShiftConv3x3(256, 1, name="last_conv0")(x)
        x = FrozenBatchNorm(256, name="last_bn0")(x)
        x = nn.relu(x)
        x = ShiftConv3x3(256, 1, name="last_conv1")(x)
        x = FrozenBatchNorm(256, name="last_bn1")(x)
        x = nn.relu(x)
        return x


def _batched_resize(x, out_hw, mode: str = "bilinear"):
    """Bilinear align-corners resize of [..., H, W, C] via the matmul path."""
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xf = x.reshape((-1,) + x.shape[-3:])
    xf = jnp.moveaxis(xf, 0, 2)                   # [H, W, N, C]
    xf = xf.reshape(h, w, -1)
    y = resize_hw(xf, out_hw, mode)
    y = y.reshape(out_hw[0], out_hw[1], -1, c)
    y = jnp.moveaxis(y, 2, 0)
    return y.reshape(lead + (out_hw[0], out_hw[1], c))


class DeepLab(nn.Module):
    """Full extractor: [N, H, W, 3] → (decoder 256 @1/4, low-level @1/4).

    ``backbone``: 'resnet' (ResNet-101, low-level 256ch) or 'mobilenet'
    (MobileNetV2, low-level 24ch) — the reference's ``build_backbone``
    dispatch (``networks/deeplab/backbone/__init__.py:3``).
    """
    output_stride: int = 16
    backbone: str = "resnet"
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.backbone == "mobilenet":
            from .mobilenet import MobileNetV2
            feats, low_level = MobileNetV2(self.output_stride,
                                           name="backbone")(x)
        else:
            feats, low_level = ResNet101(self.output_stride,
                                         name="backbone")(x)
        aspp = DeepLabASPP(dropout_rate=self.dropout_rate,
                           name="aspp")(feats, deterministic=deterministic)
        out = DeepLabDecoder(name="decoder")(aspp, low_level)
        return out, low_level
