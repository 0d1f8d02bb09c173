"""Image reconstruction (IR) task — IT + pre-decode connector + decoder.

Behavioral reference: ``vq/tasks/image_reconstruction/models.py`` —
``decode`` (:83-95) runs pre_decode connector + decoder; ``decode_from_quant``
(:97-108) maps code ids → embeddings → spatial grid → decoder. Reconstruction
losses configured like the reference's ``r_losses`` dict.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
from flax import linen as nn

from ..registries import ConnectorRegistry, DecoderRegistry, ModelRegistry
from .image_tokenization import TokenizerModel, build_submodule

__all__ = ["AutoencoderModel"]


@ModelRegistry.register()
class AutoencoderModel(TokenizerModel):
    """Full tokenize + reconstruct pipeline (reference IR BaseModel)."""

    decoder: nn.Module | None = None
    pre_decode: nn.Module | None = None

    @classmethod
    def build_pre_hook(cls, config, registry):
        config = super().build_pre_hook(config, registry)
        config["decoder"] = build_submodule(DecoderRegistry, config["decoder"])
        pd = config.get("pre_decode")
        if isinstance(pd, Mapping):
            pd = dict(pd)
            if "out_channels" not in pd and hasattr(
                config["decoder"], "in_channels"
            ):
                pd["out_channels"] = config["decoder"].in_channels
            config["pre_decode"] = build_submodule(ConnectorRegistry, pd)
        return config

    # -- decode path -------------------------------------------------------

    def decode(self, z: jax.Array) -> jax.Array:
        """(B, h, w, D) quantized features → reconstruction (B, H, W, C)."""
        if self.pre_decode is not None:
            z = self.pre_decode(z)
        return self.decoder(z)

    def decode_from_quant(self, codes: jax.Array) -> jax.Array:
        """(B, h, w) code ids → reconstruction (reference models.py:97-108)."""
        b, h, w = codes.shape
        z = self.quantizer.decode(codes.reshape(-1))
        return self.decode(z.reshape(b, h, w, -1))

    def __call__(self, x: jax.Array, train: bool = False) -> dict[str, Any]:
        feat = self.encode(x)
        qout = self.quantize(feat, train=train)
        recon = self.decode(qout.z)
        return {
            "feat": feat,
            "quantizer": qout,
            "pred": recon,
            "loss": qout.loss,
        }
