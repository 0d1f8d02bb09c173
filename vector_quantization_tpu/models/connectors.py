"""Connectors — channel adapters between encoder/quantizer/decoder.

Behavioral reference: ``vq/tasks/image_tokenization/models/connectors/``
(BaseConnector identity + channel check, base.py:13; ConvConnector 1×1 conv,
conv.py:16; ComposedConnector chain, composed.py:18).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registries import ConnectorRegistry

__all__ = ["IdentityConnector", "ConvConnector", "ComposedConnector"]


@ConnectorRegistry.register()
class IdentityConnector(nn.Module):
    in_channels: int = 0
    out_channels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.in_channels and self.out_channels:
            assert self.in_channels == self.out_channels, (
                f"identity connector with {self.in_channels} != "
                f"{self.out_channels}"
            )
        return x


@ConnectorRegistry.register()
class ConvConnector(nn.Module):
    """1×1 conv (kernel size configurable) applied on NHWC feature maps or
    plain (N, C) features."""

    out_channels: int
    kernel_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim == 2:  # flattened features: 1x1 conv == dense
            return nn.Dense(self.out_channels, dtype=self.dtype)(x)
        ks = (self.kernel_size, self.kernel_size)
        return nn.Conv(self.out_channels, ks, dtype=self.dtype)(x)


@ConnectorRegistry.register()
class ComposedConnector(nn.Module):
    connectors: Sequence[nn.Module]

    def __call__(self, x: jax.Array) -> jax.Array:
        for conn in self.connectors:
            x = conn(x)
        return x
