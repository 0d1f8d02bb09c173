"""Quantizer losses.

Behavioral reference: ``vq/algorithms/vq/losses.py:42-153`` —
- ``codebook_loss``   = mean ‖z − sg(x)‖²   (trains the codebook via the gather)
- ``commitment_loss`` = mean ‖sg(z) − x‖²   (pulls encoder output to the code)
- ``vqgan_loss``      = codebook + β·commitment (β = 0.25)
- ``entropy_loss``    = sample-entropy − mean-entropy of softmax(distance/T)
  (note: the reference softmaxes the *raw* distance divided by temperature;
  ``vq/algorithms/vq/losses.py:143-153``; pass ``sign=-1`` for the MAGVIT-style
  −distance affinity).

All losses take weight multipliers so configs mirror the reference's
``BaseLoss(weight=...)`` convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "codebook_loss",
    "commitment_loss",
    "vqgan_quantizer_loss",
    "entropy_loss",
]


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def codebook_loss(z: jax.Array, x: jax.Array, weight: float = 1.0) -> jax.Array:
    return weight * _mse(z, jax.lax.stop_gradient(x))


def commitment_loss(
    z: jax.Array, x: jax.Array, weight: float = 1.0
) -> jax.Array:
    return weight * _mse(jax.lax.stop_gradient(z), x)


def vqgan_quantizer_loss(
    z: jax.Array, x: jax.Array, beta: float = 0.25, weight: float = 1.0
) -> jax.Array:
    return weight * (codebook_loss(z, x) + beta * commitment_loss(z, x))


def entropy_loss(
    distance: jax.Array,
    temperature: float,
    sign: float = 1.0,
    weight: float = 1.0,
) -> jax.Array:
    """distance: (..., K) full distance matrix (XLA path only)."""
    affinity = sign * distance.reshape(-1, distance.shape[-1]) / temperature
    probs = jax.nn.softmax(affinity, axis=-1)
    log_probs = jax.nn.log_softmax(affinity + 1e-5, axis=-1)
    avg_probs = jnp.mean(probs, axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))
    sample_entropy = -jnp.mean(jnp.sum(probs * log_probs, axis=-1))
    return weight * (sample_entropy - avg_entropy)
