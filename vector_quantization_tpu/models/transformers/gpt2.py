"""GPT-2 style AR decoder.

Behavioral reference: ``vq/algorithms/ar/transformers/gpt.py:16-34``
(HF GPT-2 with resized token embeddings). Architecture: learned positional
embeddings, pre-LN blocks (LN → attn(+bias) → LN → gelu MLP), final LN,
lm_head tied to the token embedding (HF GPT-2 convention). Same static
KV-cache decode interface as :class:`.llama.LlamaTransformer`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registries import TransformerRegistry
from .llama import KVCache

__all__ = ["GPT2Transformer"]

_init = nn.initializers.normal(0.02)


class _GPT2Block(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, stacked_kv=None, layer_idx=0, offset=None):
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * d, kernel_init=_init, dtype=self.dtype, name="c_attn")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, t, h, dh)
        v = v.reshape(b, t, h, dh)
        if stacked_kv is not None:
            # in-place stacked-cache scatter (see llama.py LlamaBlock)
            k_all, v_all = stacked_kv
            if offset is not None and getattr(offset, "ndim", 0) == 1:
                # per-slot positions (continuous batching): t == 1
                k_all = k_all.at[layer_idx, jnp.arange(b), offset].set(
                    k[:, 0].astype(k_all.dtype)
                )
                v_all = v_all.at[layer_idx, jnp.arange(b), offset].set(
                    v[:, 0].astype(v_all.dtype)
                )
            else:
                zero = jnp.zeros((), jnp.int32)
                k_all = jax.lax.dynamic_update_slice(
                    k_all, k[None].astype(k_all.dtype),
                    (layer_idx, zero, offset, zero, zero),
                )
                v_all = jax.lax.dynamic_update_slice(
                    v_all, v[None].astype(v_all.dtype),
                    (layer_idx, zero, offset, zero, zero),
                )
            k_att = k_all[layer_idx].astype(self.dtype)
            v_att = v_all[layer_idx].astype(self.dtype)
            new_cache = (k_all, v_all)
        else:
            k_att, v_att = k, v
            new_cache = None
        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k_att, preferred_element_type=jnp.float32
        ) / jnp.sqrt(dh)
        probs = jax.nn.softmax(scores + mask, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v_att).reshape(b, t, d)
        x = x + nn.Dense(
            d, kernel_init=_init, dtype=self.dtype, name="c_proj"
        )(attn)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * d, kernel_init=_init, dtype=self.dtype, name="mlp_fc")(y)
        y = nn.gelu(y)
        y = nn.Dense(d, kernel_init=_init, dtype=self.dtype, name="mlp_proj")(y)
        return x + y, new_cache


@TransformerRegistry.register()
class GPT2Transformer(nn.Module):
    vocabulary_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        cache: KVCache | None = None,
        slot_positions: jax.Array | None = None,
    ):
        """Same decode interface as LlamaTransformer: full-sequence forward,
        incremental KV-cache decode, or per-slot continuous-batching decode
        (``slot_positions`` (B,) int32 with T == 1)."""
        b, t = tokens.shape
        wte = self.param(
            "wte", _init, (self.vocabulary_size, self.hidden_size), jnp.float32
        )
        wpe = self.param(
            "wpe", _init, (self.max_length, self.hidden_size), jnp.float32
        )
        if slot_positions is not None:
            assert cache is not None and t == 1, (
                "slot_positions requires a cache and single-token decode"
            )
            pos = wpe[slot_positions][:, None]  # (B, 1, D)
            offset = slot_positions
            s = cache.k.shape[2]
            col = jnp.arange(s)[None, None, None, :]  # (1,1,1,S)
            row = slot_positions[:, None, None, None]  # (B,1,1,1)
            mask = jnp.where(col <= row, 0.0, -1e9)
        else:
            offset = (
                cache.length if cache is not None else jnp.zeros((), jnp.int32)
            )
            pos = jax.lax.dynamic_slice_in_dim(wpe, offset, t, axis=0)[None]
            if cache is None:
                causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
                mask = jnp.where(causal, 0.0, -1e9)[None, None]
            else:
                s = cache.k.shape[2]
                col = jnp.arange(s)[None, :]
                row = jnp.arange(t)[:, None] + offset
                mask = jnp.where(col <= row, 0.0, -1e9)[None, None]
        x = (wte[tokens] + pos).astype(self.dtype)

        stacked = (cache.k, cache.v) if cache is not None else None
        for i in range(self.num_layers):
            x, stacked_new = _GPT2Block(
                num_heads=self.num_heads, dtype=self.dtype, name=f"h{i}"
            )(x, mask, stacked, i, offset if cache is not None else None)
            if stacked_new is not None:
                stacked = stacked_new
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_f")(x)
        logits = jnp.einsum(
            "btd,vd->btv",
            x.astype(jnp.float32),
            wte,
            preferred_element_type=jnp.float32,
        )  # tied head
        if cache is not None:
            return logits, KVCache(
                k=stacked[0], v=stacked[1], length=cache.length + t
            )
        return logits

    def init_cache(self, batch: int, dtype=jnp.bfloat16) -> KVCache:
        dh = self.hidden_size // self.num_heads
        shape = (self.num_layers, batch, self.max_length, self.num_heads, dh)
        return KVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
        )
