"""VQGAN conv encoder/decoder (Esser et al. U-Net halves).

Behavioral reference: ``vq/algorithms/vqgan/autoencoder.py:141-304`` —
in-conv → per-resolution ``Layer`` (depth_mult residual(+attention) blocks) →
down/upsample between resolutions → optional ``refine`` block
(res+attn+res) → GN/SiLU/conv projector. The encoder attends at the last
layer and refines after it (f16: width_mults (1,1,2,2,4)); the decoder
mirrors it (refine first, attend at layer 0, width_mults (4,2,2,1,1)).

TPU-native: NHWC, flax.linen, static Python loops (unrolled at trace time —
layer count is a config constant), attention as MXU einsum.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registries import DecoderRegistry, EncoderRegistry
from ..layers import AttnBlock, Downsample, GroupNorm32, ResBlock, Upsample

__all__ = ["VQGANEncoder", "VQGANDecoder"]

Dtype = Any


class _Refine(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = ResBlock(c, dtype=self.dtype, name="res1")(x)
        x = AttnBlock(dtype=self.dtype, name="attn")(x)
        x = ResBlock(c, dtype=self.dtype, name="res2")(x)
        return x


class _VQGANBackbone(nn.Module):
    """Shared U-Net half (reference ``VQGANMixin.forward``,
    autoencoder.py:232-248)."""

    out_channels: int
    hidden_channels: int
    width: int
    width_mults: Sequence[int]
    depth_mult: int
    attention_layer: int | None
    refine_layer: int | None
    resample: str  # 'down' | 'up' | 'none'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        widths = [self.hidden_channels] + [
            self.width * m for m in self.width_mults
        ]
        x = nn.Conv(
            self.hidden_channels, (3, 3), dtype=self.dtype, name="conv_in"
        )(x)
        num_layers = len(self.width_mults)
        for i in range(num_layers):
            if self.refine_layer is not None and i == self.refine_layer:
                x = _Refine(dtype=self.dtype, name="refine")(x)
            for d in range(self.depth_mult):
                x = ResBlock(
                    widths[i + 1], dtype=self.dtype, name=f"layer{i}_res{d}"
                )(x)
                if self.attention_layer == i:
                    x = AttnBlock(dtype=self.dtype, name=f"layer{i}_attn{d}")(x)
            if i < num_layers - 1:
                if self.resample == "down":
                    x = Downsample(dtype=self.dtype, name=f"down{i}")(x)
                elif self.resample == "up":
                    x = Upsample(dtype=self.dtype, name=f"up{i}")(x)
        if self.refine_layer is not None and self.refine_layer == num_layers:
            x = _Refine(dtype=self.dtype, name="refine")(x)
        x = GroupNorm32(self.dtype)(x)
        x = nn.silu(x)
        # 'proj_out' is the decoder's "last parameter" used by the adaptive
        # GAN weight (reference BaseDecoder.last_parameter,
        # vq/models/autoencoders.py:38; vqgan model.py:145-168)
        x = nn.Conv(
            self.out_channels, (3, 3), dtype=self.dtype, name="proj_out"
        )(x)
        return x


@EncoderRegistry.register()
class VQGANEncoder(nn.Module):
    """f16 default: 256×256×3 → 16×16×out_channels
    (reference autoencoder.py:251-276)."""

    in_channels: int = 3
    out_channels: int = 256
    width: int = 128
    width_mults: Sequence[int] = (1, 1, 2, 2, 4)
    depth_mult: int = 2
    attention_layer: int | None = None  # default: last layer
    refine_layer: int | None = None  # default: after last layer
    dtype: Dtype = jnp.float32

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.width_mults) - 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        attention_layer = (
            len(self.width_mults) - 1
            if self.attention_layer is None
            else self.attention_layer
        )
        refine_layer = (
            len(self.width_mults)
            if self.refine_layer is None
            else self.refine_layer
        )
        return _VQGANBackbone(
            out_channels=self.out_channels,
            hidden_channels=self.width,
            width=self.width,
            width_mults=self.width_mults,
            depth_mult=self.depth_mult,
            attention_layer=attention_layer,
            refine_layer=refine_layer,
            resample="down",
            dtype=self.dtype,
            name="backbone",
        )(x)


@DecoderRegistry.register()
class VQGANDecoder(nn.Module):
    """f16 default: 16×16×in_channels → 256×256×3
    (reference autoencoder.py:279-304)."""

    in_channels: int = 256
    out_channels: int = 3
    width: int = 128
    width_mults: Sequence[int] = (4, 2, 2, 1, 1)
    depth_mult: int = 3
    attention_layer: int | None = 0
    refine_layer: int | None = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _VQGANBackbone(
            out_channels=self.out_channels,
            hidden_channels=self.width * self.width_mults[0],
            width=self.width,
            width_mults=self.width_mults,
            depth_mult=self.depth_mult,
            attention_layer=self.attention_layer,
            refine_layer=self.refine_layer,
            resample="up",
            dtype=self.dtype,
            name="backbone",
        )(x)

    @staticmethod
    def last_parameter_path() -> tuple[str, ...]:
        """Path of the projector conv kernel inside this module's params —
        the reference's ``last_parameter`` for the adaptive GAN weight."""
        return ("backbone", "proj_out", "kernel")
