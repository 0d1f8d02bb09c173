"""upfirdn2d and fused bias + leaky-ReLU — XLA replacements for the
reference's only CUDA kernels.

Behavioral reference: ``mmcv.ops.upfirdn2d`` / ``mmcv.ops.FusedBiasLeakyReLU``
used solely by the StyleGAN2 discriminator
(``vq/algorithms/vqgan/discriminators/stylegan2.py:11,105,147``; SURVEY §2.9).

- ``upfirdn2d``: zero-insertion upsample by ``up`` → pad → depthwise FIR
  filter → stride-``down`` decimation. Expressed as pad + grouped conv, which
  XLA fuses onto the conv units — no custom kernel needed on TPU.
- ``fused_bias_leaky_relu``: (x + bias) → leaky_relu(0.2) → ×√2 (mmcv's
  default scale), a trivial fusion under XLA.

NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["upfirdn2d", "fused_bias_leaky_relu", "blur_kernel_2d"]


def blur_kernel_2d(taps=(1.0, 3.0, 3.0, 1.0)) -> np.ndarray:
    """Normalised separable blur kernel (StyleGAN2 [1,3,3,1])."""
    k = np.asarray(taps, np.float32)
    k2 = np.outer(k, k)
    return k2 / k2.sum()


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array | np.ndarray,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] | tuple[int, int, int, int] = (0, 0),
) -> jax.Array:
    """x: (B, H, W, C). kernel: (kh, kw). pad: (x0, x1) or (x0, x1, y0, y1)
    — mmcv upfirdn2d semantics (pad applies to both axes when 2-tuple)."""
    if len(pad) == 2:
        px0, px1 = py0, py1 = pad
    else:
        px0, px1, py0, py1 = pad
    b, h, w, c = x.shape

    if up > 1:
        x = x.reshape(b, h, 1, w, 1, c)
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0))
        )
        x = x.reshape(b, h * up, w * up, c)

    # negative pads crop
    x = jnp.pad(
        x,
        (
            (0, 0),
            (max(py0, 0), max(py1, 0)),
            (max(px0, 0), max(px1, 0)),
            (0, 0),
        ),
    )
    x = x[
        :,
        max(-py0, 0): x.shape[1] - max(-py1, 0),
        max(-px0, 0): x.shape[2] - max(-px1, 0),
        :,
    ]

    k = np.asarray(kernel, np.float32)
    kh, kw = k.shape

    # FIR. The blur kernels here are separable (outer(taps, taps)), so the
    # filter is two 1-D shift-multiply-accumulate passes — pure elementwise
    # adds that XLA fuses on the VPU. This avoids a depthwise
    # (feature_group_count=C) convolution, which neither maps onto the MXU
    # nor has a fast XLA:CPU path (it was ~1000× off speed-of-light there).
    u, s, vt = np.linalg.svd(k)
    if kh == 1 or kw == 1 or s[1:].max(initial=0.0) < 1e-6 * s[0]:
        kr = (u[:, 0] * np.sqrt(s[0])).astype(np.float32)  # vertical taps
        kc = (vt[0] * np.sqrt(s[0])).astype(np.float32)  # horizontal taps
        # match the sign convention (SVD may negate both factors)
        if kr.sum() < 0 and kc.sum() < 0:
            kr, kc = -kr, -kc
        # flip: this op applies true convolution with k (the depthwise-conv
        # formulation used correlation with k[::-1, ::-1])
        kr, kc = kr[::-1], kc[::-1]
        h2, w2 = x.shape[1], x.shape[2]
        acc = kr[0] * x[:, : h2 - kh + 1]
        for i in range(1, kh):
            acc = acc + kr[i] * x[:, i: h2 - kh + 1 + i]
        x = acc
        acc = kc[0] * x[:, :, : w2 - kw + 1]
        for j in range(1, kw):
            acc = acc + kc[j] * x[:, :, j: w2 - kw + 1 + j]
        x = acc
        if down > 1:
            x = x[:, ::down, ::down]
        return x

    # general (non-separable) kernel: depthwise conv fallback
    filt = jnp.tile(
        jnp.asarray(k[::-1, ::-1], x.dtype)[:, :, None, None], (1, 1, 1, c)
    )
    return jax.lax.conv_general_dilated(
        x,
        filt,
        window_strides=(down, down),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def fused_bias_leaky_relu(
    x: jax.Array,
    bias: jax.Array,
    negative_slope: float = 0.2,
    scale: float = 2.0**0.5,
) -> jax.Array:
    """mmcv FusedBiasLeakyReLU: (x + b) → leaky → ×√2. bias: (C,), x NHWC
    (or (..., C) for linear layers)."""
    x = x + bias
    return jax.nn.leaky_relu(x, negative_slope) * scale
