"""ConvNeXt teacher.

Behavioral reference: ``vq/algorithms/vqkd/teachers/convnext.py:17``
(torchvision ConvNeXt features). Flax implementation of the ConvNeXt trunk
(Liu et al. 2022): stem 4×4/4 conv + LN, stages of blocks (7×7 depthwise →
LN → pw 4× MLP with GELU → layer-scale), LN+2×2/2 downsample between stages.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registries import TeacherRegistry
from .base import BaseTeacher

__all__ = ["ConvNeXtTeacher"]


class _ConvNeXtBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        y = nn.Conv(
            c, (7, 7), padding=3, feature_group_count=c, dtype=self.dtype,
            name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(y)
        y = nn.Dense(4 * c, dtype=self.dtype, name="pw1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="pw2")(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (c,), jnp.float32
        )
        return x + y * gamma.astype(y.dtype)


class _ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)  # base
    widths: Sequence[int] = (128, 256, 512, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.widths[0], (4, 4), strides=(4, 4), padding="VALID",
            dtype=self.dtype, name="stem",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for si, (depth, width) in enumerate(zip(self.depths, self.widths)):
            if si > 0:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"down{si}_norm"
                )(x)
                x = nn.Conv(
                    width, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"down{si}",
                )(x)
            for bi in range(depth):
                x = _ConvNeXtBlock(dtype=self.dtype, name=f"s{si}b{bi}")(x)
        return x


@TeacherRegistry.register()
class ConvNeXtTeacher(BaseTeacher):
    depths: Sequence[int] = (3, 3, 27, 3)
    widths: Sequence[int] = (128, 256, 512, 1024)

    @property
    def out_channels(self) -> int:
        return self.widths[-1]

    @property
    def downsample_factor(self) -> int:
        return 32

    def backbone_forward(self, image: jax.Array) -> jax.Array:
        return _ConvNeXt(
            depths=self.depths, widths=self.widths, name="backbone"
        )(image)
