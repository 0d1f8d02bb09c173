"""ViT-family teachers: CLIP / DINO / MAE / torchvision-ViT.

Behavioral reference: ``vq/algorithms/vqkd/teachers/`` — ``CLIPTeacher``
(clip.py:19-65: CLIP visual tower, quick-GELU, ln_pre/ln_post, optional
projection), ``DINOTeacher`` (dino.py:17-60), ``MAETeacher`` (mae.py),
``ViTTeacher`` (vit.py:27). All are standard pre-LN ViTs differing in
activation, extra input LN, and output projection — expressed here as one
configurable backbone. Weights come from converted torch checkpoints
(tools/convert_checkpoints.py analogue); tests run with random init.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registries import TeacherRegistry
from .base import BaseTeacher

__all__ = ["ViTTeacher", "CLIPTeacher", "DINOTeacher", "MAETeacher"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _TeacherViT(nn.Module):
    """Standard pre-LN ViT trunk returning patch tokens."""

    patch_size: int
    embed_dim: int
    depth: int
    num_heads: int
    act: str = "gelu"  # 'gelu' (exact/erf, torch nn.GELU) | 'quick_gelu' (CLIP)
    pre_norm: bool = False  # CLIP ln_pre
    final_norm: bool = True
    proj_dim: int | None = None  # CLIP projection
    ln_eps: float = 1e-6  # timm/torchvision ViTs; CLIP uses torch's 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, _ = x.shape
        p = self.patch_size
        h, w = hh // p, ww // p
        act = _quick_gelu if self.act == "quick_gelu" else (
            lambda v: nn.gelu(v, approximate=False)
        )
        x = nn.Conv(
            self.embed_dim,
            (p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=not self.pre_norm,  # CLIP patch conv has no bias
            dtype=self.dtype,
            name="patch_embed",
        )(x).reshape(b, h * w, self.embed_dim)
        cls = self.param(
            "cls_token",
            nn.initializers.normal(0.02),
            (1, 1, self.embed_dim),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.embed_dim)), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, h * w + 1, self.embed_dim),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.depth):
            y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name=f"block{i}_norm1")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dtype=self.dtype,
                name=f"block{i}_attn",
            )(y, y)
            x = x + y
            y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name=f"block{i}_norm2")(x)
            y = nn.Dense(
                4 * self.embed_dim, dtype=self.dtype, name=f"block{i}_fc1"
            )(y)
            y = act(y)
            y = nn.Dense(self.embed_dim, dtype=self.dtype, name=f"block{i}_fc2")(y)
            x = x + y
        if self.final_norm:
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_post")(x)
        tokens = x[:, 1:]
        if self.proj_dim is not None:
            proj = self.param(
                "proj",
                nn.initializers.normal(0.02),
                (self.embed_dim, self.proj_dim),
                jnp.float32,
            )
            tokens = tokens @ proj.astype(self.dtype)
        return tokens.reshape(b, h, w, -1)


@TeacherRegistry.register()
class ViTTeacher(BaseTeacher):
    """Generic frozen ViT feature teacher (torchvision ViT-B/16 defaults)."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    act: str = "gelu"
    pre_norm: bool = False
    final_norm: bool = True
    proj_dim: int | None = None
    ln_eps: float = 1e-6

    @property
    def out_channels(self) -> int:
        return self.proj_dim or self.embed_dim

    @property
    def downsample_factor(self) -> int:
        return self.patch_size

    def backbone_forward(self, image: jax.Array) -> jax.Array:
        return _TeacherViT(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            act=self.act,
            pre_norm=self.pre_norm,
            final_norm=self.final_norm,
            proj_dim=self.proj_dim,
            ln_eps=self.ln_eps,
            name="backbone",
        )(image)


@TeacherRegistry.register()
class CLIPTeacher(ViTTeacher):
    """CLIP ViT-B/16 visual tower (reference clip.py:19-65): quick-GELU,
    ln_pre, optional projection to the joint space."""

    normalization: str = "clip"
    act: str = "quick_gelu"
    pre_norm: bool = True
    proj_dim: int | None = 512  # with_proj variant; None = wo_proj
    ln_eps: float = 1e-5  # OpenAI CLIP uses torch nn.LayerNorm default


@TeacherRegistry.register()
class DINOTeacher(ViTTeacher):
    """DINO ViT-B/16 (reference dino.py:17-60)."""

    normalization: str = "imagenet"


@TeacherRegistry.register()
class MAETeacher(ViTTeacher):
    """MAE ViT-B/16 encoder (reference mae.py, vendored MAE ViT)."""

    normalization: str = "imagenet"
