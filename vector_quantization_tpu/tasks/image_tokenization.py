"""Image tokenization (IT) task — encode → connect → quantize.

Behavioral reference: ``vq/tasks/image_tokenization/models/base.py`` —
``encode`` (:104) runs encoder + post_encode connector; ``quantize`` (:116-128)
flattens the spatial grid into rows, runs the quantizer, and restores the
grid; ``encode_to_quant`` (:130-151) records the feature shape and code grid.
Channel-width inference between encoder/connector/quantizer mirrors the
reference's ``build_pre_hook`` chain (:62-87).

TPU-native: NHWC feature maps; flatten is a reshape (B,H,W,C) → (B·H·W, C);
everything jit-friendly with static shapes.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
from flax import linen as nn

from ..models.quantizers.base import QuantizerOutput
from ..registries import (
    ConnectorRegistry,
    EncoderRegistry,
    ModelRegistry,
    QuantizerRegistry,
)

__all__ = ["TokenizerModel", "build_submodule"]


def build_submodule(registry, cfg, **extra):
    if cfg is None:
        return None
    if isinstance(cfg, nn.Module):
        return cfg
    return registry.build(cfg, **extra)


@ModelRegistry.register()
class TokenizerModel(nn.Module):
    """Encoder + post-encode connector + quantizer (reference IT BaseModel)."""

    encoder: nn.Module
    quantizer: nn.Module
    post_encode: nn.Module | None = None

    @classmethod
    def build_pre_hook(cls, config, registry):
        config["encoder"] = build_submodule(EncoderRegistry, config["encoder"])
        config["quantizer"] = build_submodule(
            QuantizerRegistry, config["quantizer"]
        )
        pe = config.get("post_encode")
        if isinstance(pe, Mapping):
            # reference infers the connector's out width from the quantizer
            # (models/base.py:62-87)
            pe = dict(pe)
            pe.setdefault("out_channels", config["quantizer"].embedding_dim)
            config["post_encode"] = build_submodule(ConnectorRegistry, pe)
        return config

    # -- pipeline pieces ---------------------------------------------------

    def encode(self, x: jax.Array) -> jax.Array:
        """pixels (B, H, W, 3) → features (B, h, w, D)."""
        feat = self.encoder(x)
        if self.post_encode is not None:
            feat = self.post_encode(feat)
        return feat

    def quantize(self, feat: jax.Array, train: bool = False) -> QuantizerOutput:
        """(B, h, w, D) → QuantizerOutput with z (B, h, w, D), codes (B, h, w)."""
        b, h, w, d = feat.shape
        out = self.quantizer(feat.reshape(b * h * w, d), train=train)
        return out.replace(
            z=out.z.reshape(b, h, w, -1), codes=out.codes.reshape(b, h, w)
        )

    def encode_to_quant(self, x: jax.Array) -> jax.Array:
        """pixels → code grid (B, h, w) — the fast corpus-tokenization path
        (reference Tokenizer runner, runners/tokenizer.py:43-55)."""
        feat = self.encode(x)
        b, h, w, d = feat.shape
        codes = self.quantizer.encode(feat.reshape(b * h * w, d))
        return codes.reshape(b, h, w)

    def __call__(self, x: jax.Array, train: bool = False) -> dict[str, Any]:
        feat = self.encode(x)
        qout = self.quantize(feat, train=train)
        return {"feat": feat, "quantizer": qout, "loss": qout.loss}
