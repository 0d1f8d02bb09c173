"""BEiT-style ViT encoder/decoder (VQ-KD halves).

Behavioral reference: ``vq/algorithms/vqkd/autoencoder.py`` —
- prenorm transformer blocks with LN(eps 1e-6), attention with q/v bias only
  (k bias fixed zero; :46-81), GELU MLP;
- patch embed conv, cls token + learnable position embedding (:157-172);
- ``fc_norm`` on patch tokens (cls dropped) then ``task_layer``
  [Linear → Tanh → Linear] (:183-188, :243-266);
- init: trunc-normal(.02) + per-block rescale of attn.proj / mlp.fc2 by
  1/sqrt(2(i+1)) (:191-213);
- encoder: 224px/16 → (B, 14, 14, out_chans=32); decoder: 14×14 code grid,
  patch 1, → teacher-dim features; decoder's ``last_parameter`` = final
  task-layer kernel (:320-324).

NHWC/flax; attention as MXU einsum; static pos-embed size (resolution
changes re-interpolate at weight-conversion time rather than at runtime).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registries import DecoderRegistry, EncoderRegistry

__all__ = ["ViTEncoder", "ViTDecoder"]

_trunc = nn.initializers.truncated_normal(0.02)


class _QVBiasAttention(nn.Module):
    """Attention with learnable q/v bias, zero k bias (BEiT)."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv_kernel = self.param("qkv_kernel", _trunc, (d, 3 * d), jnp.float32)
        q_bias = self.param("q_bias", nn.initializers.zeros, (d,), jnp.float32)
        v_bias = self.param("v_bias", nn.initializers.zeros, (d,), jnp.float32)
        bias = jnp.concatenate([q_bias, jnp.zeros((d,)), v_bias])
        qkv = (
            jnp.einsum("bnd,de->bne", x, qkv_kernel.astype(self.dtype))
            + bias.astype(self.dtype)
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, dh) * (dh**-0.5)
        k = k.reshape(b, n, h, dh)
        v = v.reshape(b, n, h, dh)
        attn = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, d)
        return nn.Dense(
            d, kernel_init=_trunc, dtype=self.dtype, name="proj"
        )(out)


class _Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + _QVBiasAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(
            int(d * self.mlp_ratio), kernel_init=_trunc, dtype=self.dtype, name="fc1"
        )(y)
        # exact (erf) GELU — torch nn.GELU, what BEiT/timm use; the tanh
        # approximation drifts converted-checkpoint activations by ~1e-3
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, kernel_init=_trunc, dtype=self.dtype, name="fc2")(y)
        return x + y


class _ViTBackbone(nn.Module):
    img_size: int
    patch_size: int
    out_chans: int
    out_patch_size: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    def setup(self) -> None:
        n = (self.img_size // self.patch_size) ** 2
        self.cls_token = self.param(
            "cls_token", _trunc, (1, 1, self.embed_dim), jnp.float32
        )
        self.pos_embed = self.param(
            "pos_embed", _trunc, (1, n + 1, self.embed_dim), jnp.float32
        )
        self.patch_proj = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )
        self.blocks = [
            _Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.depth)
        ]
        self.fc_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.task1 = nn.Dense(
            self.embed_dim, kernel_init=_trunc, dtype=self.dtype, name="task1"
        )
        self.task2 = nn.Dense(
            self.out_chans * self.out_patch_size**2,
            kernel_init=_trunc,
            dtype=self.dtype,
            name="task2",  # decoder's last_parameter
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, H, W, C) → (B, h·p, w·p, out_chans) (p = out_patch_size)."""
        b, hh, ww, _ = x.shape
        h = hh // self.patch_size
        w = ww // self.patch_size
        x = self.patch_proj(x).reshape(b, h * w, self.embed_dim)
        cls = jnp.broadcast_to(
            self.cls_token.astype(self.dtype), (b, 1, self.embed_dim)
        )
        x = jnp.concatenate([cls, x], axis=1)
        if x.shape[1] != self.pos_embed.shape[1]:
            raise ValueError(
                f"pos_embed size {self.pos_embed.shape[1]} != sequence "
                f"{x.shape[1]}; convert weights with interpolation instead"
            )
        x = x + self.pos_embed.astype(self.dtype)
        for blk in self.blocks:
            x = blk(x)
        x = self.fc_norm(x[:, 1:])
        x = self.task2(jnp.tanh(self.task1(x)))
        p = self.out_patch_size
        x = x.reshape(b, h, w, p, p, self.out_chans)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            b, h * p, w * p, self.out_chans
        )
        return x


@EncoderRegistry.register()
class ViTEncoder(nn.Module):
    """VQKDEncoder: 224px/16 ViT-B → (B, 14, 14, 32)."""

    img_size: int = 224
    patch_size: int = 16
    out_channels: int = 32
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @property
    def downsample_factor(self) -> int:
        return self.patch_size

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _ViTBackbone(
            img_size=self.img_size,
            patch_size=self.patch_size,
            out_chans=self.out_channels,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
            name="backbone",
        )(x)


@DecoderRegistry.register()
class ViTDecoder(nn.Module):
    """VQKDDecoder: 14×14 code grid (patch 1) → teacher-dim features."""

    img_size: int = 14
    patch_size: int = 1
    in_channels: int = 32
    out_channels: int = 512
    out_patch_size: int = 1
    embed_dim: int = 768
    depth: int = 3  # configs/vqkd/model.py decoder depth
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _ViTBackbone(
            img_size=self.img_size,
            patch_size=self.patch_size,
            out_chans=self.out_channels,
            out_patch_size=self.out_patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
            name="backbone",
        )(x)

    @staticmethod
    def last_parameter_path() -> tuple[str, ...]:
        return ("backbone", "task2", "kernel")
