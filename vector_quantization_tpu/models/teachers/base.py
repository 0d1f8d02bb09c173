"""Frozen teacher framework (VQ-KD / Cluster feature sources).

Behavioral reference: ``vq/algorithms/vqkd/teachers/base.py:19-92`` — a
teacher wraps a frozen backbone with: uint8 input → mean/std normalisation,
optional bicubic input resize (``image_wh``), backbone forward, optional
bicubic output-feature resize (``output_wh``), flattened (B, N, C) or 2-D
(B, h, w, C) output.

Mean/std presets follow the reference (todd constants): CLIP's
(0.48145466, 0.4578275, 0.40821073)/(0.26862954, 0.26130258, 0.27577711),
ImageNet's (0.485, 0.456, 0.406)/(0.229, 0.224, 0.225).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registries import TeacherRegistry

__all__ = ["BaseTeacher", "CLIP_MEAN", "CLIP_STD", "IMAGENET_MEAN", "IMAGENET_STD"]

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_PRESETS = {
    "clip": (CLIP_MEAN, CLIP_STD),
    "imagenet": (IMAGENET_MEAN, IMAGENET_STD),
    "none": ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)),
}


class BaseTeacher(nn.Module):
    """Subclasses define ``backbone_forward(image) -> (B, h, w, C)`` and
    ``out_channels``."""

    normalization: str = "imagenet"
    image_size: int | None = None  # input resize (reference image_wh)
    output_size: int | None = None  # feature-map resize (reference output_wh)

    def normalize(self, original_image: jax.Array) -> jax.Array:
        """uint8 (B, H, W, 3) → normalized float."""
        mean, std = _PRESETS[self.normalization]
        x = original_image.astype(jnp.float32) / 255.0
        return (x - jnp.asarray(mean)) / jnp.asarray(std)

    def backbone_forward(self, image: jax.Array) -> jax.Array:
        raise NotImplementedError

    @property
    def out_channels(self) -> int:
        raise NotImplementedError

    @nn.compact
    def __call__(
        self, original_image: jax.Array, return_2d: bool = False
    ) -> jax.Array:
        x = self.normalize(original_image)
        if self.image_size is not None:
            b = x.shape[0]
            s = self.image_size
            x = jax.image.resize(x, (b, s, s, 3), method="bicubic")
        feats = self.backbone_forward(x).astype(jnp.float32)
        if self.output_size is not None:
            b, h, w, c = feats.shape
            s = self.output_size
            feats = jax.image.resize(feats, (b, s, s, c), method="bicubic")
        if return_2d:
            return feats
        b, h, w, c = feats.shape
        return feats.reshape(b, h * w, c)


@TeacherRegistry.register()
class PixelTeacher(BaseTeacher):
    """Trivial teacher: average-pooled pixels as features (testing / smoke
    runs without pretrained weights)."""

    patch_size: int = 16

    @property
    def out_channels(self) -> int:
        return 3

    @property
    def downsample_factor(self) -> int:
        return self.patch_size

    def backbone_forward(self, image: jax.Array) -> jax.Array:
        p = self.patch_size
        b, h, w, c = image.shape
        x = image.reshape(b, h // p, p, w // p, p, c)
        return x.mean(axis=(2, 4))
