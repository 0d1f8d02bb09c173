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


def _kth_largest(x: jax.Array, k: int, iters: int = 40) -> jax.Array:
    """Per-row k-th largest value of (B, V) x by threshold bisection.

    O(iters·B·V) VPU compares instead of a vocabulary sort — ``lax.top_k``
    at k=600 over a 17k vocab measured ~0.6 ms/step of the AR decode loop
    (13% of the whole step); the bisection is pure elementwise work that
    XLA fuses. 40 halvings on the [row_min, row_max] bracket converge the
    threshold below float32 spacing of the logit range, and the final
    count-based select lands exactly on a realised value, so the kept set
    equals the sort-based one (ties at the value threshold are all kept —
    HF semantics).
    """
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ge = jnp.sum((x >= mid).astype(jnp.int32), axis=-1, keepdims=True)
        take_upper = ge >= k  # k-th largest is ≥ mid
        return (jnp.where(take_upper, mid, lo), jnp.where(take_upper, hi, mid))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    # lo is now ≤ the k-th largest, within ULPs: snap to the smallest
    # realised value ≥ lo (= the k-th largest itself)
    candidates = jnp.where(x >= lo, x, jnp.inf)
    return jnp.min(candidates, axis=-1, keepdims=True)


def top_k_top_p_filter(
    logits: jax.Array, top_k: int = 0, top_p: float = 1.0
) -> jax.Array:
    """(B, V) logits → filtered logits (masked entries = -inf).

    TPU note: both filters are value-threshold searches (bisection), not
    sorts — a vocabulary sort/top_k dominated the per-token decode cost at
    16k-code vocabularies. Semantics match HF ``top_k_top_p_filtering``:
    keep the top-k by value, then drop tokens whose preceding cumulative
    probability (descending order) exceeds top_p, always keeping the most
    likely token. Value ties at the top-p boundary are all kept (HF's
    index-order tie split is unobservable for continuous logits).
    """
    v = logits.shape[-1]
    k = top_k if (top_k and top_k < v) else v

    threshold = None
    if k < v:
        threshold = _kth_largest(logits, k)
        logits = jnp.where(logits < threshold, _NEG, logits)
    if top_p < 1.0:
        # mass_above(t) = Σ p_i [p_i > t]; HF keeps the shortest prefix
        # whose mass exceeds top_p ⇔ keep token i iff mass strictly above
        # its probability is still < top_p (plus always the argmax).
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.float32))
        e = jnp.where(logits <= _NEG, 0.0, e)  # filtered rows contribute 0
        z = jnp.sum(e, axis=-1, keepdims=True)
        target = top_p * z

        lo = jnp.zeros_like(z)
        e_max = jnp.max(e, axis=-1, keepdims=True)
        hi = e_max

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            mass = jnp.sum(jnp.where(e > mid, e, 0.0), axis=-1, keepdims=True)
            # find the largest t with mass_above(t) ≥ target: the kept set
            # is then {p_i > t} ∪ boundary ties
            cond = mass >= target
            return (jnp.where(cond, mid, lo), jnp.where(cond, hi, mid))

        lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
        # smallest realised e-value > lo = the last token HF keeps
        kept = jnp.where(e > lo, e, jnp.inf)
        e_thr = jnp.min(kept, axis=-1, keepdims=True)
        keep = (e >= e_thr) | (e == e_max)  # always keep the argmax
        logits = jnp.where(keep, logits, _NEG)
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
