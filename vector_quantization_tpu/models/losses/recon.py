"""Pixel reconstruction losses/metrics.

Behavioral reference: ``vq/tasks/image_reconstruction/losses.py`` —
L1/MSE (:40-97) on [-1,1] images; PSNR (:212-222) = −10·log10(per-image MSE)
on [0,1] images; SSIM (:182-208), which the reference computes on CPU via
skimage — here a native JAX implementation with skimage-compatible defaults
(uniform 7×7 window, K1=0.01, K2=0.03, per-channel then averaged), so it runs
on-device inside the jitted eval step instead of a host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["l1_loss", "mse_loss", "cosine_loss", "psnr", "ssim"]


def cosine_loss(
    pred: jax.Array, target: jax.Array, weight: float = 1.0
) -> jax.Array:
    """Cosine-embedding loss: mean(1 − cos(pred, target)) over the channel
    axis — the VQ-KD distillation loss (reference
    ``vq/algorithms/utils/losses.py:11-62`` wrapping torch
    CosineEmbeddingLoss with target=1)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    dot = jnp.sum(p * t, axis=-1)
    denom = jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1)
    return weight * jnp.mean(1.0 - dot / jnp.maximum(denom, 1e-8))


def l1_loss(pred: jax.Array, target: jax.Array, weight: float = 1.0) -> jax.Array:
    return weight * jnp.mean(jnp.abs(pred - target))


def mse_loss(pred: jax.Array, target: jax.Array, weight: float = 1.0) -> jax.Array:
    return weight * jnp.mean(jnp.square(pred - target))


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-image PSNR, averaged over batch. Inputs in [0, 1]."""
    mse = jnp.mean(
        jnp.square(pred - target), axis=tuple(range(1, pred.ndim))
    )
    return jnp.mean(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))


def _uniform_filter(x: jax.Array, win: int) -> jax.Array:
    """Mean filter over spatial dims of (B, H, W, C), VALID padding."""
    kernel = jnp.ones((win, win, 1, 1), x.dtype) / (win * win)
    c = x.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM over batch. Inputs (B, H, W, C) in [0, data_range].

    Matches skimage ``structural_similarity`` defaults (uniform window,
    per-channel mean) used by the reference's SSIMLoss.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = _uniform_filter(pred, win_size)
    mu_t = _uniform_filter(target, win_size)
    mu_pp = _uniform_filter(pred * pred, win_size)
    mu_tt = _uniform_filter(target * target, win_size)
    mu_pt = _uniform_filter(pred * target, win_size)

    # skimage uses the unbiased (n/(n-1)) covariance estimator
    n = win_size * win_size
    cov_norm = n / (n - 1)
    var_p = cov_norm * (mu_pp - mu_p * mu_p)
    var_t = cov_norm * (mu_tt - mu_t * mu_t)
    cov = cov_norm * (mu_pt - mu_p * mu_t)

    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)
