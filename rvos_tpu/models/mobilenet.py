"""MobileNetV2 backbone (flax.linen, NHWC) — the reference's alternative
backbone (``networks/deeplab/backbone/mobilenet.py:69``, configured via
``MODEL_BACKBONE='mobilenet'`` but unused by the released configs).

Inverted-residual tower with output stride 16 via dilation in the last
stages; exposes the 24-channel stride-4 features as the low-level pair
(the reference decoder's ``low_level_inplanes=24`` branch,
``deeplab/decoder.py:11``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .resnet import FrozenBatchNorm


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=pad, feature_group_count=self.groups,
                    use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu6(x)


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        hidden = in_features * self.expand
        use_res = self.stride == 1 and in_features == self.features
        y = x
        if self.expand != 1:
            y = _ConvBN(hidden, 1, name="expand")(y)
        y = _ConvBN(hidden, 3, self.stride, self.dilation, groups=hidden,
                    name="depthwise")(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="project")(y)
        y = FrozenBatchNorm(self.features, name="project_bn")(y)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    """Returns (stride-16 320-ch features, low-level 24-ch stride-4)."""
    output_stride: int = 16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # (expand, features, blocks, stride)
        cfgs = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        x = _ConvBN(32, 3, 2, name="stem")(x)
        current_stride = 2
        dilation = 1
        low_level = None
        idx = 0
        for t, cdim, n, s in cfgs:
            for i in range(n):
                stride = s if i == 0 else 1
                if current_stride >= self.output_stride and stride > 1:
                    dilation *= stride
                    stride = 1
                else:
                    current_stride *= stride
                x = InvertedResidual(cdim, stride, t, dilation,
                                     name=f"block_{idx}")(x)
                idx += 1
            if cdim == 24:
                low_level = x
        return x, low_level
