"""ClusterEncoder — a frozen teacher used as the tokenizer encoder.

Behavioral reference: ``vq/algorithms/cluster/autoencoders.py:16-55`` — the
teacher consumes the *original* (uint8) image. Our task models feed the
[-1, 1] ``image``; this wrapper converts back to the 0-255 scale first
(identical pixels up to the codec round-trip).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registries import EncoderRegistry, TeacherRegistry
from .base import BaseTeacher

__all__ = ["ClusterEncoder"]


@EncoderRegistry.register()
class ClusterEncoder(nn.Module):
    teacher: BaseTeacher

    @classmethod
    def build_pre_hook(cls, config, registry):
        config["teacher"] = TeacherRegistry.build_or_return(config["teacher"])
        return config

    @property
    def out_channels(self) -> int:
        return self.teacher.out_channels

    @property
    def downsample_factor(self) -> int:
        return self.teacher.downsample_factor

    def __call__(self, image: jax.Array) -> jax.Array:
        original = jnp.clip((image + 1.0) * 127.5, 0, 255)
        return self.teacher(original, return_2d=True)
