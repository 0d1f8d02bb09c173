"""FSQ / SQ quantizer modules.

Behavioral reference: ``vq/algorithms/sq/quantizers.py:11-13`` (trivial
ScalarQuantizer) and ``vq/algorithms/fsq/quantizers.py:75-150``
(FiniteScalarQuantizer). Parameter-free — all math in
:class:`vector_quantization_tpu.ops.fsq.FSQCodec`.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import FSQCodec
from ...registries import QuantizerRegistry
from .base import QuantizerOutput

__all__ = ["FiniteScalarQuantizer", "ScalarQuantizer"]


@QuantizerRegistry.register()
class FiniteScalarQuantizer(nn.Module):
    """levels e.g. (8, 8, 5, 5, 5) → 8000 codes (configs/fsq/model.py:15-18)."""

    levels: Sequence[int]
    eps: float = 1e-3
    losses: Mapping[str, Mapping[str, Any]] | None = None  # typically empty

    @property
    def codec(self) -> FSQCodec:
        return FSQCodec(levels=tuple(self.levels), eps=self.eps)

    @property
    def codebook_size(self) -> int:
        return self.codec.codebook_size

    @property
    def embedding_dim(self) -> int:
        return len(self.levels)

    def encode(self, x: jax.Array) -> jax.Array:
        return self.codec.encode(x)[0]

    def decode(self, codes: jax.Array) -> jax.Array:
        return self.codec.decode(codes)

    def embeddings(self) -> jax.Array:
        return self.codec.embeddings()

    def __call__(self, x: jax.Array, train: bool = False) -> QuantizerOutput:
        codes, z = self.codec.encode(x)
        return QuantizerOutput(
            z=z,
            codes=codes,
            loss=jnp.zeros((), jnp.float32),
            losses={},
            aux={"x": x},
        )


@QuantizerRegistry.register()
class ScalarQuantizer(FiniteScalarQuantizer):
    """Scalar quantization (reference ``vq/algorithms/sq/quantizers.py:11-13``
    — there an empty BaseQuantizer subclass that FSQ *extends*; here the
    generic round-STE machinery lives in FSQCodec, so the registered parity
    class shares it with default FSQ levels)."""

    levels: Sequence[int] = (8, 8, 5, 5, 5)
