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
        int8_kv = False
        if stacked_kv is not None:
            # per-layer (B, S, H, Dh) arrays — in-place writes (see
            # llama.py KVCache: stacked-carry scatters copy the stack)
            from .llama import _quant_kv

            int8_kv = len(stacked_kv) == 4
            if int8_kv:
                k_all, v_all, k_sc_all, v_sc_all = stacked_kv
                k_w, k_s = _quant_kv(k)
                v_w, v_s = _quant_kv(v)
            else:
                k_all, v_all = stacked_kv
                k_w, v_w = k, v
            if offset is not None and getattr(offset, "ndim", 0) == 1:
                # per-slot positions (continuous batching): t == 1
                rows = jnp.arange(b)
                k_all = k_all.at[rows, offset].set(
                    k_w[:, 0].astype(k_all.dtype)
                )
                v_all = v_all.at[rows, offset].set(
                    v_w[:, 0].astype(v_all.dtype)
                )
                if int8_kv:
                    k_sc_all = k_sc_all.at[rows, offset].set(k_s[:, 0])
                    v_sc_all = v_sc_all.at[rows, offset].set(v_s[:, 0])
            else:
                zero = jnp.zeros((), jnp.int32)
                k_all = jax.lax.dynamic_update_slice(
                    k_all, k_w.astype(k_all.dtype), (zero, offset, zero, zero)
                )
                v_all = jax.lax.dynamic_update_slice(
                    v_all, v_w.astype(v_all.dtype), (zero, offset, zero, zero)
                )
                if int8_kv:
                    k_sc_all = jax.lax.dynamic_update_slice(
                        k_sc_all, k_s, (zero, offset, zero)
                    )
                    v_sc_all = jax.lax.dynamic_update_slice(
                        v_sc_all, v_s, (zero, offset, zero)
                    )
            k_att = k_all.astype(self.dtype)
            v_att = v_all.astype(self.dtype)
            if int8_kv:
                new_cache = (k_all, v_all, k_sc_all, v_sc_all)
                k_sc_b = k_sc_all.transpose(0, 2, 1)[:, :, None, :]
                v_sc_b = v_sc_all.transpose(0, 2, 1)[:, :, None, :]
            else:
                new_cache = (k_all, v_all)
        else:
            k_att, v_att = k, v
            new_cache = None
        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k_att, preferred_element_type=jnp.float32
        ) / jnp.sqrt(dh)
        if int8_kv:
            scores = scores * k_sc_b
        probs = jax.nn.softmax(scores + mask, axis=-1)
        if int8_kv:
            probs = probs * v_sc_b
        probs = probs.astype(self.dtype)
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
            s = cache.window
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
                s = cache.window
                col = jnp.arange(s)[None, :]
                row = jnp.arange(t)[:, None] + offset
                mask = jnp.where(col <= row, 0.0, -1e9)[None, None]
        x = (wte[tokens] + pos).astype(self.dtype)

        int8_cache = cache is not None and cache.k_scale is not None
        k_list = list(cache.k) if cache is not None else None
        v_list = list(cache.v) if cache is not None else None
        ks_list = list(cache.k_scale) if int8_cache else None
        vs_list = list(cache.v_scale) if int8_cache else None
        for i in range(self.num_layers):
            if cache is None:
                layer_kv = None
            elif int8_cache:
                layer_kv = (k_list[i], v_list[i], ks_list[i], vs_list[i])
            else:
                layer_kv = (k_list[i], v_list[i])
            x, updated = _GPT2Block(
                num_heads=self.num_heads, dtype=self.dtype, name=f"h{i}"
            )(x, mask, layer_kv, i, offset if cache is not None else None)
            if updated is not None:
                k_list[i], v_list[i] = updated[0], updated[1]
                if int8_cache:
                    ks_list[i], vs_list[i] = updated[2], updated[3]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_f")(x)
        logits = jnp.einsum(
            "btd,vd->btv",
            x.astype(jnp.float32),
            wte,
            preferred_element_type=jnp.float32,
        )  # tied head
        if cache is not None:
            return logits, KVCache(
                k=tuple(k_list),
                v=tuple(v_list),
                length=cache.length + t,
                k_scale=tuple(ks_list) if int8_cache else None,
                v_scale=tuple(vs_list) if int8_cache else None,
            )
        return logits

    def init_cache(self, batch: int, dtype=jnp.bfloat16) -> KVCache:
        from .llama import make_dense_cache

        dh = self.hidden_size // self.num_heads
        return make_dense_cache(
            self.num_layers, batch, self.max_length, self.num_heads, dh, dtype
        )
