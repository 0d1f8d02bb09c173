"""PatchGAN discriminator.

Behavioral reference: ``vq/algorithms/vqgan/discriminators/patchgan.py:16-99``
— 4×4 conv stride-2 pyramid with BatchNorm+LeakyReLU(0.2), width doubling
capped at 8×, stride-1 penultimate block, 1-channel logit head; weights
init N(0, 0.02) (DCGAN-style).

NHWC; BatchNorm uses the ``batch_stats`` collection (train=True updates it).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registries import DiscriminatorRegistry

__all__ = ["PatchGANDiscriminator"]

_conv_init = nn.initializers.normal(0.02)


@DiscriminatorRegistry.register()
class PatchGANDiscriminator(nn.Module):
    in_channels: int = 3
    width: int = 64
    depth: int = 3
    kernel_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ks = (self.kernel_size, self.kernel_size)
        x = nn.Conv(
            self.width,
            ks,
            strides=(2, 2),
            padding=1,
            kernel_init=_conv_init,
            dtype=self.dtype,
        )(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for n in range(1, self.depth):
            mult = min(2**n, 8)
            x = nn.Conv(
                self.width * mult,
                ks,
                strides=(2, 2),
                padding=1,
                use_bias=False,
                kernel_init=_conv_init,
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                scale_init=_conv_init_shifted,
                dtype=self.dtype,
            )(x)
            x = nn.leaky_relu(x, 0.2)
        mult = min(2**self.depth, 8)
        x = nn.Conv(
            self.width * mult,
            ks,
            strides=(1, 1),
            padding=1,
            use_bias=False,
            kernel_init=_conv_init,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            scale_init=_conv_init_shifted,
            dtype=self.dtype,
        )(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(
            1, ks, padding=1, kernel_init=_conv_init, dtype=self.dtype
        )(x)


def _conv_init_shifted(key, shape, dtype=jnp.float32):
    """BatchNorm scale init N(1, 0.02) (reference weights_init)."""
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02
