"""Experimental hybrid: VQGAN + VQ-KD feature-distillation branch.

Behavioral reference: ``vq/algorithms/exp/vqgan_vqkd/base.py:32-166`` — a
VQGAN whose quantized features additionally feed a second (pre_decode +
decoder) branch predicting frozen-teacher features; the cosine distillation
loss joins the generation-phase loss. The combined normalize/k-means
quantizer callback (``quantizer_callback.py:39-130``) maps to
``codebook_update='kmeans'`` here.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.losses.recon import cosine_loss
from ..registries import (
    AlgorithmRegistry,
    ConnectorRegistry,
    DecoderRegistry,
    ModelRegistry,
    TeacherRegistry,
)
from ..tasks.image_reconstruction import AutoencoderModel
from ..tasks.image_tokenization import build_submodule
from ..training.state import TrainState
from .vqgan import VQGANAlgorithm

__all__ = ["VQGANVQKDModel", "VQGANVQKDAlgorithm"]


@ModelRegistry.register()
class VQGANVQKDModel(AutoencoderModel):
    """AutoencoderModel + a second feature-decoder branch."""

    vqkd_decoder: nn.Module | None = None
    vqkd_pre_decode: nn.Module | None = None

    @classmethod
    def build_pre_hook(cls, config, registry):
        config = super().build_pre_hook(config, registry)
        config["vqkd_decoder"] = build_submodule(
            DecoderRegistry, config["vqkd_decoder"]
        )
        pd = config.get("vqkd_pre_decode")
        if isinstance(pd, Mapping):
            pd = dict(pd)
            if "out_channels" not in pd and hasattr(
                config["vqkd_decoder"], "in_channels"
            ):
                pd["out_channels"] = config["vqkd_decoder"].in_channels
            config["vqkd_pre_decode"] = build_submodule(ConnectorRegistry, pd)
        return config

    def vqkd_decode(self, z: jax.Array) -> jax.Array:
        if self.vqkd_pre_decode is not None:
            z = self.vqkd_pre_decode(z)
        return self.vqkd_decoder(z)

    def __call__(self, x: jax.Array, train: bool = False):
        out = super().__call__(x, train=train)
        # run the branch in the main forward so its params are initialised
        # and gradients flow through the generation loss
        out["vqkd_pred"] = self.vqkd_decode(out["quantizer"].z)
        return out


@AlgorithmRegistry.register()
class VQGANVQKDAlgorithm(VQGANAlgorithm):
    def __init__(
        self,
        *,
        teacher: Mapping[str, Any] | Any,
        distill_weight: float = 1.0,
        **kwargs: Any,
    ) -> None:
        kwargs.setdefault("codebook_update", {"type": "kmeans", "decay": 0.99})
        super().__init__(**kwargs)
        self.teacher = TeacherRegistry.build_or_return(teacher)
        self.distill_weight = distill_weight

    def init_state(self, rng: jax.Array, batch) -> TrainState:
        rng, t_rng = jax.random.split(rng)
        state = super().init_state(rng, batch)
        extra = dict(state.extra)
        extra["teacher_params"] = self.teacher.init(
            t_rng, batch["original_image"], return_2d=True
        ).get("params", {})
        return state.replace(extra=extra)

    def _augment_generation_out(self, g_params, out, rng) -> dict:
        # the split generation phase (vqgan.py train_step) bypasses
        # VQGANVQKDModel.__call__; run the distill branch here so gradients
        # still flow through the generation loss
        out["vqkd_pred"] = self.model.apply(
            {"params": g_params},
            out["quantizer"].z,
            method=self.model.vqkd_decode,
            rngs={"dropout": rng},
        )
        return out

    def _extra_generation_losses(self, g_params, out, batch, extra) -> dict:
        feats = self.teacher.apply(
            {"params": extra["teacher_params"]},
            batch["original_image"],
            return_2d=True,
        )
        feats = jax.lax.stop_gradient(feats)
        return {
            "loss_distill": self.distill_weight
            * cosine_loss(out["vqkd_pred"], feats)
        }
