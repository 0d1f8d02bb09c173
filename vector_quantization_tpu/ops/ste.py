"""Straight-through estimator.

Reference: ``vq/tasks/image_tokenization/models/quantizers/utils/ste.py:8-9``
(``x + (z - x).detach()``). In JAX the detach is ``lax.stop_gradient``; the
result equals ``z`` in the forward pass and routes the full cotangent to ``x``
in the backward pass (none to ``z``).
"""

from __future__ import annotations

import jax

__all__ = ["ste"]


def ste(z: jax.Array, x: jax.Array) -> jax.Array:
    """Forward value ``z``, gradient flows to ``x`` only."""
    return x + jax.lax.stop_gradient(z - x)
