"""GAN losses.

Behavioral reference: ``vq/algorithms/vqgan/losses/`` —
- hinge discriminator loss: mean(relu(1+fake) + relu(1−real))/2
  (discriminator.py:29-40)
- generator loss: mean(−fake) (generator.py:27-33)
- non-saturating generator loss: BCE(fake, 1) (generator.py:36-44)
- R1 gradient penalty: per-sample ‖∇_x D(x)‖² on real images
  (discriminator.py:43-85) — implemented with ``jax.grad`` wrt the image.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "hinge_d_loss",
    "vanilla_g_loss",
    "non_saturating_g_loss",
    "r1_gradient_penalty",
]


def hinge_d_loss(
    logits_fake: jax.Array, logits_real: jax.Array, weight: float = 1.0
) -> jax.Array:
    loss = (
        jax.nn.relu(1.0 + logits_fake) + jax.nn.relu(1.0 - logits_real)
    ) / 2.0
    return weight * jnp.mean(loss)


def vanilla_g_loss(logits_fake: jax.Array, weight: float = 1.0) -> jax.Array:
    return weight * jnp.mean(-logits_fake)


def non_saturating_g_loss(
    logits_fake: jax.Array, weight: float = 1.0
) -> jax.Array:
    # BCE with target 1: softplus(-logits)
    return weight * jnp.mean(jax.nn.softplus(-logits_fake))


def r1_gradient_penalty(
    d_apply: Callable[[jax.Array], jax.Array],
    image: jax.Array,
    weight: float = 1.0,
) -> jax.Array:
    """``d_apply`` must run the discriminator in eval mode (the reference
    flips it to .eval() for this pass, discriminator.py:55-63)."""

    def scalar_d(x):
        return jnp.sum(d_apply(x))  # == grad with ones cotangent

    grads = jax.grad(scalar_d)(image)
    per_sample = jnp.sum(
        jnp.square(grads), axis=tuple(range(1, grads.ndim))
    )
    return weight * jnp.mean(per_sample)
