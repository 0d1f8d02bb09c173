"""Finite Scalar Quantization (FSQ) — codebook-free round-STE quantization.

Behavioral reference: ``vq/algorithms/fsq/quantizers.py:59-139`` (bounded tanh
encode, round with STE, mixed-radix digit↔decimal conversion, lattice
"virtual" codebook). Pure XLA — everything is elementwise + tiny reductions,
which XLA fuses; no kernel needed (SURVEY §7.2).

Conventions (matching the reference exactly):
- ``levels`` = scalars per channel, e.g. ``(8, 8, 5, 5, 5)`` → 8000 codes.
- encode: ``z = tanh(x + atanh(odd/max)) * max − odd`` with
  ``max = (L−1)(1−eps)``, ``odd = (L−1) % 2``; halve; round-STE; normalised
  output is ``z/−(L//2)…`` i.e. ``z / (L//2)`` in [−1, 1]; the code id is the
  little-endian mixed-radix decimal of the shifted digits.
- decode: digits = ``(code // cumprod) % L``; ``z = digits/(L//2) − 1``.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from .ste import ste

__all__ = ["FSQCodec"]


@dataclasses.dataclass(frozen=True)
class FSQCodec:
    """Stateless mixed-radix FSQ encoder/decoder for one channel layout."""

    levels: tuple[int, ...]
    eps: float = 1e-3

    @cached_property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))

    @property
    def num_channels(self) -> int:
        return len(self.levels)

    @cached_property
    def _radix_cumprod(self) -> np.ndarray:
        # little-endian: code = sum_i digit_i * prod_{j<i} L_j
        return np.concatenate([[1], np.cumprod(self.levels[:-1])]).astype(
            np.int64
        )

    def bound(self, x: jax.Array) -> jax.Array:
        """Continuous bounded pre-round value (half-scaled, centered)."""
        levels = jnp.asarray(self.levels, dtype=x.dtype)
        max_ = (levels - 1) * (1 - self.eps)
        odd = jnp.asarray([(l - 1) % 2 for l in self.levels], dtype=x.dtype)
        shift = jnp.arctanh(odd / max_)
        z = jnp.tanh(x + shift) * max_ - odd
        return z / 2

    def encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """x: (..., C) → (codes (...,) int32, z (..., C) in [−1, 1]).

        ``z`` carries STE gradients back to ``x``; ``codes`` are non-diff.
        """
        if x.shape[-1] != self.num_channels:
            raise ValueError(
                f"FSQ expects {self.num_channels} channels, got {x.shape}"
            )
        z = self.bound(x)
        z = ste(jnp.round(z), z)
        half = jnp.asarray([l // 2 for l in self.levels], dtype=x.dtype)
        z_norm = z / half
        digits = jax.lax.stop_gradient(z + half).astype(jnp.int32)
        codes = self.to_decimal(digits)
        return codes, z_norm

    def to_decimal(self, digits: jax.Array) -> jax.Array:
        cumprod = jnp.asarray(self._radix_cumprod, dtype=jnp.int32)
        return jnp.sum(digits * cumprod, axis=-1).astype(jnp.int32)

    def from_decimal(self, codes: jax.Array) -> jax.Array:
        cumprod = jnp.asarray(self._radix_cumprod, dtype=jnp.int32)
        levels = jnp.asarray(self.levels, dtype=jnp.int32)
        return (codes[..., None] // cumprod) % levels

    def decode(self, codes: jax.Array, dtype=jnp.float32) -> jax.Array:
        """codes (...,) int → z (..., C) lattice points in [−1, 1]."""
        digits = self.from_decimal(codes).astype(dtype)
        half = jnp.asarray([l // 2 for l in self.levels], dtype=dtype)
        return digits / half - 1.0

    def embeddings(self, dtype=jnp.float32) -> jax.Array:
        """The full (K, C) lattice — the reference's virtual codebook buffer."""
        return self.decode(jnp.arange(self.codebook_size), dtype=dtype)
