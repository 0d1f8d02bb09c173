"""Quantizer interface.

Functional re-design of the reference's ``BaseQuantizer`` template
(``vq/tasks/image_tokenization/models/quantizers/base.py:26-183``): the
encode→decode→loss pipeline is one pure ``__call__`` returning a
``QuantizerOutput``; the callback side effects (EMA/CVQ/k-means codebook
writes) become explicit state-update functions invoked by the train step
(see :mod:`vector_quantization_tpu.ops.codebook`), and the STE is applied
in the concrete quantizer's ``__call__``.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct

__all__ = ["QuantizerOutput"]


@struct.dataclass
class QuantizerOutput:
    """What a quantizer forward returns (the reference's quantizer memo).

    - ``z``: straight-through quantized features (N, D) — decoder input,
      gradients flow to the encoder.
    - ``codes``: (N,) int32 code ids.
    - ``loss``: scalar — sum of the registered quantizer losses.
    - ``losses``: individual loss values by name.
    - ``aux``: extras needed by codebook-update fns / metrics (e.g. the
      post-normalize encoder features ``x``, the distance matrix when a
      loss requires it).
    """

    z: jax.Array
    codes: jax.Array
    loss: jax.Array
    losses: dict[str, jax.Array]
    aux: dict[str, Any]
