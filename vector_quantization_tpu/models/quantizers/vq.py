"""VectorQuantizer — codebook lookup quantizer (the system's heart).

Behavioral reference: ``vq/algorithms/vq/quantizers.py:19-117`` (distance →
argmin → gather → losses → STE) plus the ``NormalizeCallback`` spherical
variant (``vq/algorithms/vq/callbacks/normalize.py:20-30``). The hot path
runs the fused Pallas kernel (:mod:`..ops.vq_lookup`).

Loss configuration mirrors the reference's quantizer ``losses`` dict
(``configs/vqgan/model.py`` style): ``{"vqgan": {"beta": 0.25}}`` or
``{"codebook": {...}, "commitment": {...}, "entropy": {...}}``.

Codebook state: a ``params`` entry named ``codebook`` (K, D). Gradient-trained
algorithms (VQGAN) let the optimizer update it via the codebook loss;
EMA-updated algorithms (VQ-KD / CVQ / Cluster) exclude it from the optimizer
and apply :mod:`..ops.codebook` updates in the train step.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import (
    codebook_loss,
    commitment_loss,
    entropy_loss,
    normalize,
    pairwise_distance,
    ste,
    vq_quantize,
    vqgan_quantizer_loss,
)
from ...registries import QuantizerRegistry
from .base import QuantizerOutput

__all__ = ["VectorQuantizer"]


def _init_uniform(scale: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


@QuantizerRegistry.register()
class VectorQuantizer(nn.Module):
    codebook_size: int
    embedding_dim: int
    distance: str = "l2"  # 'l2' | 'cosine'
    losses: Mapping[str, Mapping[str, Any]] | None = None
    # NormalizeCallback: L2-normalise inputs and codebook before encode
    # (spherical codebook — LlamaGen-style configs)
    normalize_inputs: bool = False
    # 'uniform' = VQGANQuantizer's uniform(-1/K, 1/K) init
    # (vq/algorithms/vqgan/quantizer.py:14-25); 'normal' for k-means-seeded
    # quantizers that get overwritten by lazy init (VQKDQuantizer).
    codebook_init: str = "uniform"
    param_dtype: Any = jnp.float32

    def setup(self) -> None:
        if self.codebook_init == "uniform":
            init_fn = _init_uniform(1.0 / self.codebook_size)
        elif self.codebook_init == "normal":
            init_fn = nn.initializers.normal(1.0)
        else:
            raise ValueError(f"unknown init {self.codebook_init!r}")
        self.codebook = self.param(
            "codebook",
            init_fn,
            (self.codebook_size, self.embedding_dim),
            self.param_dtype,
        )

    # -- pieces (usable via nn.apply method=...) ---------------------------

    def effective_codebook(self) -> jax.Array:
        e = self.codebook
        return normalize(e) if self.normalize_inputs else e

    def encode(self, x: jax.Array) -> jax.Array:
        """(N, D) features → (N,) int32 codes."""
        if self.normalize_inputs:
            x = normalize(x)
        return vq_quantize(x, self.effective_codebook(), self.distance)[0]

    def decode(self, codes: jax.Array) -> jax.Array:
        """(N,) codes → (N, D) embeddings (differentiable gather)."""
        return jnp.take(self.effective_codebook(), codes, axis=0)

    # -- full pipeline ------------------------------------------------------

    def __call__(self, x: jax.Array, train: bool = False) -> QuantizerOutput:
        if self.normalize_inputs:
            x = normalize(x)
        e = self.effective_codebook()
        codes, z = vq_quantize(x, e, self.distance)

        losses_cfg = dict(self.losses or {})
        loss_vals: dict[str, jax.Array] = {}
        aux: dict[str, Any] = {"x": x}
        if "entropy" in losses_cfg or "distance" in (
            losses_cfg.get("_aux_", ()) or ()
        ):
            aux["distance"] = pairwise_distance(x, e, self.distance)
        for name, cfg in losses_cfg.items():
            cfg = dict(cfg or {})
            if name == "vqgan":
                loss_vals["loss_vqgan"] = vqgan_quantizer_loss(z, x, **cfg)
            elif name == "codebook":
                loss_vals["loss_codebook"] = codebook_loss(z, x, **cfg)
            elif name == "commitment":
                loss_vals["loss_commitment"] = commitment_loss(z, x, **cfg)
            elif name == "entropy":
                loss_vals["loss_entropy"] = entropy_loss(aux["distance"], **cfg)
            elif name == "_aux_":
                pass
            else:
                raise ValueError(f"unknown quantizer loss {name!r}")
        total = sum(loss_vals.values(), jnp.zeros((), jnp.float32))

        z_ste = ste(z, x)
        return QuantizerOutput(
            z=z_ste, codes=codes, loss=total, losses=loss_vals, aux=aux
        )
