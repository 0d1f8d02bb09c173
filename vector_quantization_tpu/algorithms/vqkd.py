"""VQ-KD (BEiT-v2) — tokenizer distilled from a frozen IU teacher.

Behavioral reference (SURVEY §2.6 ``vqkd``; ``vq/algorithms/vqkd/base.py``):
- decoder reconstructs **teacher features** of the original image, not
  pixels; loss = commitment (quantizer) + cosine-embedding distillation
  (``configs/vqkd/model.py:30-72``);
- codebook: k-means lazy init on the first batch + synced online EMA
  k-means every step, codebook excluded from the optimizer
  (``quantizers/callbacks.py:39-129``) — both provided by the base
  algorithm's ``lazy_kmeans_init`` / ``codebook_update='kmeans'`` machinery;
- cosine-distance spherical lookup (NormalizeCallback folded into the
  quantizer's ``normalize_inputs``).

The frozen teacher's params live in ``state.extra['teacher_params']``.

Cluster (``vq/algorithms/cluster``) — the training-free tokenizer — is the
degenerate sibling: the *teacher is the encoder*, no decoder, only the
codebook 'trains' (CodebookLoss + synced CVQ updates). ``ClusterAlgorithm``
below.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from ..registries import AlgorithmRegistry, TeacherRegistry
from ..training.state import TrainState
from .base import ReconstructionAlgorithm

__all__ = ["VQKDAlgorithm", "ClusterAlgorithm"]


@AlgorithmRegistry.register()
class VQKDAlgorithm(ReconstructionAlgorithm):
    def __init__(
        self,
        *,
        teacher: Mapping[str, Any] | Any,
        teacher_image_key: str = "original_image",
        **kwargs: Any,
    ) -> None:
        kwargs.setdefault("recon_losses", {"cosine": {}})
        kwargs.setdefault("codebook_update", {"type": "kmeans", "decay": 0.99})
        kwargs.setdefault("lazy_kmeans_init", {"iters": 10})
        opt = dict(kwargs.get("optimizer") or {"type": "adamw", "lr": 2e-4})
        opt.setdefault("exclude", "codebook")  # EMA-updated, not optimized
        kwargs["optimizer"] = opt
        super().__init__(**kwargs)
        self.teacher = TeacherRegistry.build_or_return(teacher)
        self.teacher_image_key = teacher_image_key

    def init_state(self, rng: jax.Array, batch) -> TrainState:
        rng, t_rng = jax.random.split(rng)
        state = super().init_state(rng, batch)
        teacher_params = self.teacher.init(
            t_rng, batch[self.teacher_image_key], return_2d=True
        ).get("params", {})
        extra = dict(state.extra)
        extra["teacher_params"] = teacher_params
        return state.replace(extra=extra)

    def _recon_target(self, out, batch, extra) -> jax.Array:
        feats = self.teacher.apply(
            {"params": extra["teacher_params"]},
            batch[self.teacher_image_key],
            return_2d=True,
        )
        return jax.lax.stop_gradient(feats)


@AlgorithmRegistry.register()
class ClusterAlgorithm(ReconstructionAlgorithm):
    """Training-free tokenizer (reference ``cluster``): frozen teacher as
    encoder (``ClusterEncoder``, cluster/autoencoders.py:16-55), codebook
    learned by CodebookLoss + synced CVQ updates; only the quantizer trains
    (configs/cluster/model.py:16-36)."""

    def __init__(self, **kwargs: Any) -> None:
        kwargs.setdefault(
            "codebook_update",
            {"type": "cvq", "ema_decay": 0.99, "anchor": "nearest", "sync": True},
        )
        kwargs.setdefault("recon_losses", {})
        super().__init__(**kwargs)
