"""ResNet-101 backbone (flax.linen, NHWC) for DeepLabv3+.

Reference: ``networks/deeplab/backbone/resnet.py`` — bottleneck ResNet,
output stride 16 (strides [1,2,2,1], dilations [1,1,1,2]), multi-grid
[1,2,4] in layer4, ``layer1`` output exposed as the low-level feature.

FrozenBatchNorm (``networks/layers/normalization.py:6-24``) keeps the
affine + running stats as non-learning parameters; ``stop_gradient``
makes them inert under autodiff so the optimizer mask is belt-and-
braces.  With ``MODEL_FREEZE_BN=True`` (the only released setting) this
is the entire normalization story of the backbone.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ShiftConv3x3


class FrozenBatchNorm(nn.Module):
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        weight, bias, mean, var = jax.tree.map(
            jax.lax.stop_gradient, (weight, bias, mean, var))
        scale = weight * jax.lax.rsqrt(var + self.epsilon)
        return x * scale + (bias - mean * scale)


class ResNetBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        if self.stride == 1:
            # stride-1 3x3 as nine shifted matmuls — XLA:TPU row-slices
            # batch-1 NHWC convs (see ShiftConv3x3); stride-2 blocks
            # keep the native conv (only 3 of them, halved output)
            out = ShiftConv3x3(self.planes, self.dilation,
                               name="conv2")(out)
        else:
            out = nn.Conv(self.planes, (3, 3),
                          strides=(self.stride, self.stride),
                          kernel_dilation=(self.dilation, self.dilation),
                          padding=self.dilation, use_bias=False,
                          name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes * 4,
                                       name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet101(nn.Module):
    """Returns (stride-16 features [.., 2048], low-level stride-4 [.., 256])."""
    output_stride: int = 16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.output_stride == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        else:
            raise NotImplementedError(self.output_stride)
        blocks = (3, 4, 23, 3)
        multi_grid = (1, 2, 4)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def layer(x, planes, n_blocks, stride, dilation, name, grid=None):
            inplanes = x.shape[-1]
            for i in range(n_blocks):
                d = dilation * (grid[i] if grid else 1)
                s = stride if i == 0 else 1
                need_ds = (i == 0) and (stride != 1 or inplanes != planes * 4)
                x = ResNetBottleneck(planes, s, d, need_ds,
                                     name=f"{name}_{i}")(x)
                inplanes = planes * 4
            return x

        x = layer(x, 64, blocks[0], strides[0], dilations[0], "layer1")
        low_level = x
        x = layer(x, 128, blocks[1], strides[1], dilations[1], "layer2")
        x = layer(x, 256, blocks[2], strides[2], dilations[2], "layer3")
        x = layer(x, 512, len(multi_grid), strides[3], dilations[3], "layer4",
                  grid=multi_grid)
        return x, low_level
