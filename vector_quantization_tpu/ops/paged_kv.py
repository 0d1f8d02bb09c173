"""Paged KV cache — block-pooled attention cache for continuous batching.

The north-star serving design (BASELINE.json): slots at staggered decode
positions share one page pool instead of each reserving a full
``max_length`` static cache. Pages are allocated incrementally by the host
at each sync (the vLLM insight, TPU-shaped): the pool can be sized for the
*sum of live tokens* plus slack, not ``slots × max_length``.

Layout (static shapes, jit-friendly):

- pool: k/v ``(L, num_pages, page_size, H, Dh)``;
- ``page_table`` ``(B, pages_per_slot)`` int32 — page ids per slot in
  logical order (entries beyond a slot's allocation are 0; masked off by
  the position mask, so stale data there is harmless);
- per-step write: position ``p`` of slot ``b`` lands in
  ``pool[layer, page_table[b, p // ps], p % ps]``;
- attention read: gather the slot's pages →
  ``(B, pages_per_slot·ps, H, Dh)`` logical keys, mask ``col <= pos``.

The gather touches ``pages_per_slot·ps`` rows per slot — identical traffic
to the static cache at equal logical capacity; the win is pool sizing and
allocation granularity, not per-step bytes.

INT8 pool (``dtype=jnp.int8``): k/v hold INT8 values with per-(page-row,
head) f32 max-abs scales in ``k_scale``/``v_scale`` (L, P, ps, H) — the
same per-(position, head) scheme the dense cache uses
(models/transformers/llama.py ``_quant_kv``); the scale commutes with the
Dh contraction so attention applies it after the score matmul / folds it
into the probs, and the pool read stays int8-sized (the 1.52x decode lever
of BENCH_r03, composed into the paged serving path — VERDICT r3 #1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["PagedKVCache", "init_paged_cache", "paged_update", "paged_gather"]


class PagedKVCache(NamedTuple):
    k: jax.Array  # (L, num_pages, page_size, H, Dh)
    v: jax.Array
    page_table: jax.Array  # (B, pages_per_slot) int32
    k_scale: jax.Array | None = None  # (L, num_pages, page_size, H) f32
    v_scale: jax.Array | None = None

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def logical_length(self) -> int:
        return self.page_table.shape[1] * self.k.shape[2]


def init_paged_cache(
    num_layers: int,
    num_pages: int,
    page_size: int,
    batch: int,
    pages_per_slot: int,
    num_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> PagedKVCache:
    shape = (num_layers, num_pages, page_size, num_heads, head_dim)
    table = jnp.zeros((batch, pages_per_slot), jnp.int32)
    if dtype == jnp.int8:
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            page_table=table,
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    return PagedKVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        page_table=table,
    )


def _quant_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, H, Dh) → int8 values + per-(B, H) f32 max-abs scales."""
    xf = x.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / sc[..., None]), -127, 127).astype(jnp.int8)
    return q, sc


def paged_update(
    cache: PagedKVCache,
    layer: int,
    positions: jax.Array,  # (B,) int32 — write position per slot
    k: jax.Array,  # (B, H, Dh)
    v: jax.Array,
) -> PagedKVCache:
    """Scatter one token's k/v per slot into the page pool (quantising on
    the way in when the pool is INT8)."""
    ps = cache.page_size
    b = positions.shape[0]
    rows = jnp.arange(b)
    page = cache.page_table[rows, positions // ps]  # (B,)
    offset = positions % ps
    if cache.k_scale is not None:
        k, k_sc = _quant_rows(k)
        v, v_sc = _quant_rows(v)
        cache = cache._replace(
            k_scale=cache.k_scale.at[layer, page, offset].set(k_sc),
            v_scale=cache.v_scale.at[layer, page, offset].set(v_sc),
        )
    k_pool = cache.k.at[layer, page, offset].set(k.astype(cache.k.dtype))
    v_pool = cache.v.at[layer, page, offset].set(v.astype(cache.v.dtype))
    return cache._replace(k=k_pool, v=v_pool)


def paged_gather(
    cache: PagedKVCache, layer: int
) -> tuple[jax.Array, jax.Array, jax.Array | None, jax.Array | None]:
    """Logical (B, S, H, Dh) keys/values for every slot (S = pages·ps),
    plus (B, S, H) scales when the pool is INT8 (else None, None)."""
    b, p = cache.page_table.shape
    ps = cache.page_size
    k = cache.k[layer][cache.page_table]  # (B, P, ps, H, Dh)
    v = cache.v[layer][cache.page_table]
    h, dh = k.shape[-2:]
    k_sc = v_sc = None
    if cache.k_scale is not None:
        k_sc = cache.k_scale[layer][cache.page_table].reshape(b, p * ps, h)
        v_sc = cache.v_scale[layer][cache.page_table].reshape(b, p * ps, h)
    return (
        k.reshape(b, p * ps, h, dh),
        v.reshape(b, p * ps, h, dh),
        k_sc,
        v_sc,
    )
