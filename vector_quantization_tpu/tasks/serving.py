"""Continuous-batching AR serving engine.

North-star feature beyond the reference (whose generation is batch-locked,
``vq/algorithms/ar/transformers/base.py:41-56``): a slot-based decode loop
where every batch slot tracks its OWN sequence position — new requests
prefill (class token at position 0) in the same jitted step while other
slots are mid-image, so the chip never waits for a full batch to finish.

One compiled ``slot_step`` advances all slots by one token per call; the
host loop drains finished slots and refills them from the request queue.
Works with the float or INT8-quantized transformer.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformers.llama import KVCache
from ..models.transformers.sampling import sample_tokens
from .sequence_modeling import TokenCodebook

__all__ = ["ARServer"]


@dataclasses.dataclass
class _Slot:
    request_id: int | None = None
    category: int = 0
    tokens: list[int] = dataclasses.field(default_factory=list)


class ARServer:
    """Class-conditional image-token server.

    >>> server = ARServer(transformer, params, codebook, image_tokens=256)
    >>> server.submit(category=3)
    >>> finished = server.run_until_drained()
    """

    def __init__(
        self,
        transformer: Any,
        params: Any,
        image_codebook: TokenCodebook,
        *,
        image_tokens: int,
        batch_slots: int = 16,
        sampler: Mapping[str, Any] | None = None,
        seed: int = 0,
        cache_dtype=jnp.bfloat16,
    ) -> None:
        self.transformer = transformer
        self.params = params
        self.codebook = image_codebook
        self.image_tokens = image_tokens
        self.batch_slots = batch_slots
        self.sampler = dict(sampler or {})
        self.rng = jax.random.PRNGKey(seed)
        self.queue: deque[tuple[int, int]] = deque()  # (request_id, category)
        self.slots = [_Slot() for _ in range(batch_slots)]
        self._next_id = 0
        self.cache = transformer.init_cache(batch_slots, dtype=cache_dtype)

        # device state: current token + position per slot (inactive slots
        # idle at position 0 with the uncondition/zero token)
        self.tokens = np.zeros(batch_slots, np.int32)
        self.positions = np.zeros(batch_slots, np.int32)
        self.active = np.zeros(batch_slots, bool)

        sampler_cfg = self.sampler

        def slot_step(params, cache, tokens, positions, key):
            logits, cache = transformer.apply(
                {"params": params},
                tokens[:, None],
                cache,
                slot_positions=positions,
            )
            next_tokens = sample_tokens(
                key,
                logits[:, -1],
                image_codebook.start,
                image_codebook.end,
                temperature=sampler_cfg.get("temperature", 1.0),
                top_k=sampler_cfg.get("top_k", 0),
                top_p=sampler_cfg.get("top_p", 1.0),
            )
            return next_tokens, cache

        self._slot_step = jax.jit(slot_step)

    # -- public api --------------------------------------------------------

    def submit(self, category: int) -> int:
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, int(category)))
        return rid

    @property
    def pending(self) -> int:
        return len(self.queue) + int(self.active.sum())

    def step(self) -> list[tuple[int, np.ndarray]]:
        """Advance every slot one token; returns finished (request_id, codes)."""
        self._fill_slots()
        if not self.active.any():
            return []
        self.rng, key = jax.random.split(self.rng)
        next_tokens, self.cache = self._slot_step(
            self.params,
            self.cache,
            jnp.asarray(self.tokens),
            jnp.asarray(self.positions),
            key,
        )
        next_np = np.asarray(next_tokens)

        finished: list[tuple[int, np.ndarray]] = []
        for i, slot in enumerate(self.slots):
            if not self.active[i]:
                continue
            slot.tokens.append(int(next_np[i]))
            self.positions[i] += 1
            self.tokens[i] = next_np[i]
            if len(slot.tokens) >= self.image_tokens:
                codes = self.codebook.debias(
                    np.asarray(slot.tokens, np.int32)
                )
                finished.append((slot.request_id, codes))
                self.active[i] = False
                self.slots[i] = _Slot()
                self.positions[i] = 0
                self.tokens[i] = 0
        return finished

    def run_until_drained(self, max_steps: int | None = None):
        out = []
        steps = 0
        while self.pending:
            out.extend(self.step())
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break
        return out

    # -- internals ---------------------------------------------------------

    def _fill_slots(self) -> None:
        for i, slot in enumerate(self.slots):
            if self.active[i] or not self.queue:
                continue
            rid, category = self.queue.popleft()
            self.slots[i] = _Slot(request_id=rid, category=category)
            self.active[i] = True
            # prefill: the class token enters at position 0 on this step
            self.tokens[i] = category
            self.positions[i] = 0
