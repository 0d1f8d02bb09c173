"""Pairwise distances between flattened features and a codebook.

Reference semantics: ``vq/algorithms/vq/distances.py:29-46`` (``L2Distance`` =
cdist, ``CosineDistance`` = 1 − x̂·êᵀ). On TPU we never materialise an N×K
distance matrix on the hot path (the fused Pallas kernel in
:mod:`vector_quantization_tpu.ops.vq_lookup` computes running argmins); these
XLA implementations are the reference path used by tests, losses that need the
full matrix (entropy loss), and small problems.

All distances are computed with the matmul expansion so the MXU does the work:
``‖x−e‖² = ‖x‖² − 2x·e + ‖e‖²``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["l2_distance_sq", "cosine_distance", "normalize", "pairwise_distance"]


def normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x * jax.lax.rsqrt(
        jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps
    )


def l2_distance_sq(x: jax.Array, e: jax.Array) -> jax.Array:
    """Squared L2 distances. x: (N, D), e: (K, D) → (N, K), float32."""
    x = x.astype(jnp.float32)
    e = e.astype(jnp.float32)
    x_sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)  # (N, 1)
    e_sq = jnp.sum(jnp.square(e), axis=-1)  # (K,)
    xe = jax.lax.dot_general(
        x, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return jnp.maximum(x_sq - 2.0 * xe + e_sq[None, :], 0.0)


def cosine_distance(x: jax.Array, e: jax.Array) -> jax.Array:
    """1 − cos(x, e). x: (N, D), e: (K, D) → (N, K), float32."""
    xn = normalize(x.astype(jnp.float32))
    en = normalize(e.astype(jnp.float32))
    sim = jax.lax.dot_general(
        xn, en, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return 1.0 - sim


def pairwise_distance(x: jax.Array, e: jax.Array, metric: str) -> jax.Array:
    if metric == "l2":
        return l2_distance_sq(x, e)
    if metric == "cosine":
        return cosine_distance(x, e)
    raise ValueError(f"unknown distance metric: {metric!r}")
