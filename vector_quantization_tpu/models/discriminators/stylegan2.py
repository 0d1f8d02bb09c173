"""StyleGAN2 discriminator.

Behavioral reference: ``vq/algorithms/vqgan/discriminators/stylegan2.py``
(SURVEY §2.6): equalized-learning-rate convs/linears (weights stored N(0,1),
scaled by 1/√fan_in at use), fused bias+leaky-ReLU(0.2)·√2 activations,
[1,3,3,1] blur before stride-2 downsample convs (upfirdn2d), residual blocks
scaled by 1/√2, minibatch-std feature, 4×4 head → equalized linear logit.

The CUDA ops (mmcv upfirdn2d / FusedBiasLeakyReLU) are XLA compositions in
:mod:`...ops.upfirdn` — they fuse under XLA, no custom kernel needed.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.upfirdn import blur_kernel_2d, fused_bias_leaky_relu, upfirdn2d
from ...registries import DiscriminatorRegistry

__all__ = ["StyleGAN2Discriminator"]

_normal = nn.initializers.normal(1.0)


class EqualConv(nn.Module):
    features: int
    kernel_size: int
    downsample: bool = False
    use_bias: bool = True
    activate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        ks = self.kernel_size
        kernel = self.param(
            "kernel", _normal, (ks, ks, c_in, self.features), jnp.float32
        )
        fan_in = ks * ks * c_in
        kernel = kernel / jnp.sqrt(fan_in)
        if self.downsample:
            pad = (ks // 2 + 1, (ks + 1) // 2)
            x = upfirdn2d(x, blur_kernel_2d(), pad=pad)
            strides, padding = (2, 2), "VALID"
        else:
            strides, padding = (1, 1), ks // 2
        x = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=strides,
            padding=(
                padding
                if padding == "VALID"
                else [(padding, padding)] * 2
            ),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.activate:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            return fused_bias_leaky_relu(x, bias)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            x = x + bias
        return x


class EqualLinear(nn.Module):
    features: int
    activate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        kernel = self.param("kernel", _normal, (d, self.features), jnp.float32)
        x = x @ (kernel / jnp.sqrt(d))
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if self.activate:
            return fused_bias_leaky_relu(x, bias)
        return x + bias


class _Residual(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        y = EqualConv(c, 3, activate=True, name="conv1")(x)
        y = EqualConv(
            self.out_channels, 3, downsample=True, activate=True, name="conv2"
        )(y)
        s = EqualConv(
            self.out_channels, 1, downsample=True, use_bias=False,
            name="shortcut",
        )(x)
        return (s + y) / math.sqrt(2.0)


def _minibatch_std(
    x: jax.Array, batch_groups: int = 4, eps: float = 1e-8
) -> jax.Array:
    """Append the cross-group feature std as an extra channel
    (reference Std, stylegan2.py:176-206)."""
    b, h, w, c = x.shape
    bg = min(b, batch_groups)
    y = x.reshape(bg, b // bg, h, w, c)
    y = jnp.sqrt(jnp.var(y, axis=0) + eps)  # (b/bg, h, w, c)
    y = jnp.mean(y, axis=(1, 2, 3))  # (b/bg,)
    y = jnp.tile(y, bg)[:, None, None, None]
    y = jnp.broadcast_to(y, (b, h, w, 1))
    return jnp.concatenate([x, y], axis=-1)


@DiscriminatorRegistry.register()
class StyleGAN2Discriminator(nn.Module):
    """channel_multiplier/max_channels scale the width table (the original
    StyleGAN2 `channel_multiplier` knob; 1.0/512 = reference widths)."""

    image_size: int
    batch_groups: int = 4
    channel_multiplier: float = 1.0
    max_channels: int = 512

    CHANNELS = {
        4: 512, 8: 512, 16: 512, 32: 512, 64: 512,
        128: 256, 256: 128, 512: 64, 1024: 32,
    }

    def _width(self, res: int) -> int:
        return max(
            8,
            min(
                self.max_channels,
                int(self.CHANNELS[res] * self.channel_multiplier),
            ),
        )

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> jax.Array:
        channels = [
            self._width(2**i)
            for i in range(int(math.log2(self.image_size)), 1, -1)
        ]
        x = EqualConv(channels[0], 1, activate=True, name="from_rgb")(image)
        for i, oc in enumerate(channels[1:]):
            x = _Residual(oc, name=f"res{i}")(x)
        x = _minibatch_std(x, self.batch_groups)
        x = EqualConv(self._width(4), 3, activate=True, name="final_conv")(x)
        x = x.reshape(x.shape[0], -1)
        x = EqualLinear(self._width(4), activate=True, name="fc1")(x)
        return EqualLinear(1, name="fc2")(x)
