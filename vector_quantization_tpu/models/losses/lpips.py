"""LPIPS perceptual loss (VGG16 backbone), in flax.

Behavioral reference: ``vq/tasks/image_reconstruction/losses.py:100-178`` —
inputs in [−1, 1] are normalised with the LPIPS shift/scale
(mean (−.030, −.088, −.188), std (.458, .448, .450)); VGG16 features are
tapped after the ReLUs at torchvision indices [3, 8, 15, 22, 29]
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3), channel-L2-normalised;
squared differences go through learned 1×1 convs (the converted LPIPS
``lin`` weights), spatial-mean, summed over the 5 scales. The reference
applies train-mode dropout before the lin convs; eval (the metric path)
has no dropout — replicated here with a ``deterministic`` flag.

Weights load from a converted checkpoint (tools/convert_weights.py);
random init otherwise (tests / smoke runs).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LPIPS"]

_MEAN = (-0.030, -0.088, -0.188)
_STD = (0.458, 0.448, 0.450)

# torchvision VGG16 conv plan: (channels, convs per stage)
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class _VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        idx = 0
        for si, (width, depth) in enumerate(_STAGES):
            for di in range(depth):
                x = nn.Conv(width, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            feats.append(x)  # after the stage's last ReLU
            if si < len(_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), (2, 2))
        return feats


class LPIPS(nn.Module):
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        pred: jax.Array,
        target: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """pred/target (B, H, W, 3) in [−1, 1] → scalar LPIPS."""

        def normalize_input(x):
            return (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)

        vgg = _VGG16Features(name="vgg")
        f_pred = vgg(normalize_input(pred))
        f_tgt = vgg(normalize_input(target))

        total = jnp.zeros((), jnp.float32)
        for i, (fp, ft) in enumerate(zip(f_pred, f_tgt)):
            fp = fp * jax.lax.rsqrt(
                jnp.sum(jnp.square(fp), axis=-1, keepdims=True) + 1e-10
            )
            ft = ft * jax.lax.rsqrt(
                jnp.sum(jnp.square(ft), axis=-1, keepdims=True) + 1e-10
            )
            diff = jnp.square(fp - ft)
            if not deterministic:
                diff = nn.Dropout(rate=self.dropout, deterministic=False)(diff)
            lin = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin{i}",
                kernel_init=nn.initializers.constant(1.0),
            )(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3)).mean()
        return total
