"""Train state pytree.

The functional home of everything the reference keeps as module/optimizer/
callback state (SURVEY §7 design stance): params, optimizer state(s), step
counter, PRNG key, and ``extra`` — algorithm-specific non-gradient state
(EMA codebook stats, CVQ probability buffers, lazy-init flags, EMA shadows).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["TrainState"]


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    # second optimizer (GAN discriminator) — None elsewhere
    d_opt_state: Any = None
    # algorithm-specific mutable state (codebook probability, init flags, ...)
    extra: Mapping[str, Any] = struct.field(default_factory=dict)

    @classmethod
    def create(cls, params, opt_state, rng, **kw) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=rng,
            **kw,
        )

    def next_rng(self) -> tuple["TrainState", jax.Array]:
        rng, sub = jax.random.split(self.rng)
        return self.replace(rng=rng), sub
