"""Samplers for AR generation.

Behavioral reference: ``vq/tasks/sequence_modeling/models/samplers.py`` —
- BaseSampler (:21-46): softmax-multinomial restricted to the codebook id
  range [start, end) then re-biased;
- TopKTopPSampler (:49-72): temperature / top-k=600 / top-p=0.92 filtering
  (HF ``top_k_top_p_filtering`` semantics: keep top-k, then drop tokens with
  cumulative probability above top_p, always keeping the most likely token);
- CFGSampler (:75-120): logits = (1−α)·uncond + α·cond over a doubled batch,
  sampled tokens repeated 2×.

All pure JAX (jit/scan-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["top_k_top_p_filter", "sample_tokens", "cfg_mix"]

_NEG = -1e10


def top_k_top_p_filter(
    logits: jax.Array, top_k: int = 0, top_p: float = 1.0
) -> jax.Array:
    """(B, V) logits → filtered logits (masked entries = -inf).

    TPU note: uses ``lax.top_k`` (O(V·log k)) instead of a full bitonic sort
    of the vocabulary — the sort dominated the per-token decode cost at
    16k-code vocabularies. With both filters active, the top-p pass runs on
    the already-extracted top-k slice (identical to HF's sequential
    filtering semantics, since top-k masking precedes the top-p softmax).
    """
    v = logits.shape[-1]
    k = top_k if (top_k and top_k < v) else v

    if k < v or top_p < 1.0:
        top_vals, _ = jax.lax.top_k(logits, k)  # descending (B, k)
        threshold = top_vals[:, -1:]  # top-k cutoff
        if top_p < 1.0:
            probs = jax.nn.softmax(top_vals, axis=-1)
            cumprobs = jnp.cumsum(probs, axis=-1)
            # HF semantics: drop tokens whose *preceding* cumulative mass
            # already exceeds top_p (always keep the most likely token)
            remove = jnp.concatenate(
                [
                    jnp.zeros_like(cumprobs[:, :1], dtype=bool),
                    cumprobs[:, :-1] > top_p,
                ],
                axis=-1,
            )
            kept = jnp.where(remove, jnp.inf, top_vals)
            p_threshold = jnp.min(kept, axis=-1, keepdims=True)
            threshold = jnp.maximum(threshold, p_threshold)
        logits = jnp.where(logits < threshold, _NEG, logits)
    return logits


def sample_tokens(
    key: jax.Array,
    logits: jax.Array,
    start: int,
    end: int,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """(B, V) logits → (B,) token ids in [start, end)."""
    logits = logits[:, start:end] / temperature
    logits = top_k_top_p_filter(logits, top_k, top_p)
    tokens = jax.random.categorical(key, logits, axis=-1)
    return (tokens + start).astype(jnp.int32)


def cfg_mix(logits: jax.Array, alpha: float) -> jax.Array:
    """Doubled batch [uncond; cond] → (B/2, V) mixed logits."""
    uncond, cond = jnp.split(logits, 2, axis=0)
    return (1.0 - alpha) * uncond + alpha * cond
