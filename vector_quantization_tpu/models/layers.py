"""Shared conv-net building blocks (NHWC, bf16-friendly).

Behavioral reference for the VQGAN blocks:
``vq/algorithms/vqgan/autoencoder.py:18-138`` (GroupNorm32(eps 1e-6) + SiLU
residual blocks, single-head post-norm attention with residual, asymmetric-pad
stride-2 downsample, nearest-neighbour ×2 upsample + conv).

TPU notes: everything is NHWC (XLA's preferred conv layout on TPU); attention
is an einsum over the flattened spatial grid so it rides the MXU; compute dtype
is configurable with params kept in f32 (mixed-precision training).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["GroupNorm32", "ResBlock", "AttnBlock", "Downsample", "Upsample"]

Dtype = Any


class GroupNorm32(nn.Module):
    """GroupNorm(32, eps=1e-6) — the reference's fixed choice
    (autoencoder.py:23,57). Falls back to C groups for test-sized widths
    below 32 channels (identical at all real model widths)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        groups = 32 if c % 32 == 0 else c
        return nn.GroupNorm(
            num_groups=groups, epsilon=1e-6, dtype=self.dtype
        )(x)


class ResBlock(nn.Module):
    """GN32 → SiLU → conv3x3 → GN32 → SiLU → conv3x3, 1x1-conv shortcut on
    channel change (reference ``Residual``, autoencoder.py:44-70)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = GroupNorm32(self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="shortcut"
            )(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over the spatial grid with residual
    (reference ``Attention``, autoencoder.py:18-41)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        y = GroupNorm32(self.dtype)(x).reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
            / jnp.sqrt(c).astype(jnp.float32),
            axis=-1,
        ).astype(self.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, dtype=self.dtype, name="proj")(y)
        return x + y.reshape(b, h, w, c)


class Downsample(nn.Module):
    """Zero-pad (0,1)x(0,1) then 3x3 stride-2 conv (autoencoder.py:113-124)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            c, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype
        )(x)


class Upsample(nn.Module):
    """Nearest ×2 then 3x3 conv (autoencoder.py:127-138)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(c, (3, 3), dtype=self.dtype)(x)
