"""Functional codebook statistics and non-gradient codebook updates.

The reference mutates ``embedding.weight.data`` mid-forward from callbacks
(``vq/algorithms/vq/callbacks/update.py:53-57``); on TPU these become pure
state-in/state-out functions executed inside the jitted train step, with
cross-device reductions expressed as ``jax.lax.psum``/``all_gather`` along the
data axis (SURVEY §5 "TPU-native equivalent"). When ``axis_name`` is None the
functions are single-device (or already-global) computations — identical math.

Covered behaviors:
- ``QuantStatistics`` histogram/frequency (``vq/algorithms/vq/utils.py:13-58``)
- spherical-codebook normalisation (``vq/algorithms/vq/callbacks/normalize.py``)
- EMA k-means codebook update (VQ-KD, ``vq/algorithms/vqkd/quantizers/callbacks.py:44-129``)
- k-means initialisation (same file, ``lazy_init_weights``)
- CVQ-VAE anchor-based reinit (``vq/algorithms/cvqvae/quantizer_callback.py:75-105``
  + ``anchors.py``)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .distances import normalize

__all__ = [
    "code_histogram",
    "code_frequency",
    "ema",
    "cluster_stats",
    "kmeans_update",
    "kmeans_init",
    "cvq_decay",
    "cvq_update",
    "nearest_anchors",
    "multinomial_anchors",
    "random_anchors",
    "cached_anchors",
]


def _maybe_psum(x: jax.Array, axis_name: str | None) -> jax.Array:
    return jax.lax.psum(x, axis_name) if axis_name else x


def code_histogram(
    codes: jax.Array, codebook_size: int, axis_name: str | None = None
) -> jax.Array:
    """bincount of code ids → (K,) int32, optionally summed across devices."""
    hist = jnp.zeros(codebook_size, jnp.int32).at[codes.reshape(-1)].add(1)
    return _maybe_psum(hist, axis_name)


def code_frequency(
    codes: jax.Array, codebook_size: int, axis_name: str | None = None
) -> jax.Array:
    hist = code_histogram(codes, codebook_size, axis_name).astype(jnp.float32)
    n = jnp.asarray(codes.size, jnp.float32)
    n = _maybe_psum(n, axis_name)
    return hist / n


def ema(old: jax.Array, new: jax.Array, decay) -> jax.Array:
    """``decay·old + (1−decay)·new`` — todd ``utils.ema`` semantics.

    ``decay`` may be a scalar or broadcastable per-entry array (CVQ uses a
    per-code decay column).
    """
    decay = jnp.asarray(decay, old.dtype)
    return old * decay + new.astype(old.dtype) * (1.0 - decay)


def cluster_stats(
    x: jax.Array,
    codes: jax.Array,
    codebook_size: int,
    axis_name: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Per-code (counts (K,), feature sums (K, D)).

    The scatter-add is expressed as a one-hot matmul so it lands on the MXU
    (K×N×D flops but bandwidth-bound alternatives lose on TPU).
    """
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    codes = codes.reshape(-1)
    onehot = jax.nn.one_hot(codes, codebook_size, dtype=jnp.float32)  # (N, K)
    counts = jnp.sum(onehot, axis=0)
    sums = jax.lax.dot_general(
        onehot,
        x,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact f32 sums for centroids
    )  # (K, D)
    counts = _maybe_psum(counts, axis_name)
    sums = _maybe_psum(sums, axis_name)
    return counts, sums


def kmeans_update(
    codebook: jax.Array,
    x: jax.Array,
    codes: jax.Array,
    decay: float | None = None,
    *,
    normalize_input: bool = True,
    renormalize: bool = True,
    axis_name: str | None = None,
) -> jax.Array:
    """One synced k-means/EMA step (VQ-KD ``after_encode`` semantics).

    centroids = mean of assigned (normalised) features, keeping the old entry
    for empty codes; optionally L2-renormalised; optionally EMA'd into the
    codebook. Reference ``vqkd/quantizers/callbacks.py:114-129``.
    """
    if normalize_input:
        x = normalize(x.reshape(-1, x.shape[-1]))
    counts, sums = cluster_stats(x, codes, codebook.shape[0], axis_name)
    occurred = counts > 0
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    centroids = jnp.where(occurred[:, None], centroids, codebook)
    if renormalize:
        centroids = normalize(centroids)
    new = centroids if decay is None else ema(codebook, centroids, decay)
    if renormalize:
        new = normalize(new)
    return new.astype(codebook.dtype)


def kmeans_init(
    x: jax.Array,
    codebook_size: int,
    key: jax.Array,
    iters: int = 10,
    *,
    normalize_input: bool = True,
    axis_name: str | None = None,
    max_points: int = 2**20,
    chunk_elems: int = 2**27,
) -> jax.Array:
    """Data-dependent k-means codebook init (VQ-KD lazy init).

    TPU-native version of ``vqkd/quantizers/callbacks.py:77-112``: instead of
    the reference's rank-0 gather + broadcast funnel, every device all-gathers
    the features and runs the identical deterministic k-means, so codebooks
    stay bit-synced with no broadcast step.

    Memory guard (the reference offloads to CPU when the distance matrix
    exceeds 2³⁰ elements, ``callbacks.py:86-95``): the feature matrix is
    capped at ``max_points`` rows (deterministic subsample — k-means init is
    approximate anyway), and when the (N, K) distance/one-hot intermediates
    would exceed ``chunk_elems`` elements (default 2²⁷ ≈ 512 MB f32) the
    assignment + accumulation runs as a ``lax.scan`` over row chunks, so HBM
    peak stays bounded regardless of global batch size."""
    from .vq_lookup import nearest_codes  # local import to avoid cycle

    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    if axis_name:
        x = jax.lax.all_gather(x, axis_name).reshape(-1, x.shape[-1])
    if normalize_input:
        x = normalize(x)
    n, dim = x.shape
    key, sub_key = jax.random.split(key)
    if n > max_points:
        sel = jax.random.choice(sub_key, n, (max_points,), replace=False)
        x = x[sel]
        n = max_points
    if n < codebook_size:
        # reference behavior: first n entries get data, the rest keep init
        pad = jnp.zeros((codebook_size - n, dim), x.dtype)
        return jnp.concatenate([x, pad], axis=0)
    idx = jax.random.choice(key, n, (codebook_size,), replace=False)
    e = x[idx]

    if n * codebook_size <= chunk_elems:

        def body(_, e):
            e = normalize(e)
            codes = nearest_codes(x, e, "l2")
            return kmeans_update(
                e, x, codes, None, normalize_input=False, renormalize=False
            )

    else:
        chunk = max(128, chunk_elems // codebook_size)
        num_chunks = -(-n // chunk)
        n_pad = num_chunks * chunk - n
        xp = (
            jnp.concatenate([x, jnp.zeros((n_pad, dim), x.dtype)])
            if n_pad
            else x
        )
        x_chunks = xp.reshape(num_chunks, chunk, dim)
        # padded rows get code id K → all-zero one-hot → excluded exactly
        valid = (jnp.arange(num_chunks * chunk) < n).reshape(num_chunks, chunk)

        def body(_, e):
            e_n = normalize(e)

            def step(carry, inp):
                counts, sums = carry
                xc, vc = inp
                codes = nearest_codes(xc, e_n, "l2")
                codes = jnp.where(vc, codes, codebook_size)
                c2, s2 = cluster_stats(xc, codes, codebook_size)
                return (counts + c2, sums + s2), None

            (counts, sums), _ = jax.lax.scan(
                step,
                (
                    jnp.zeros(codebook_size, jnp.float32),
                    jnp.zeros((codebook_size, dim), jnp.float32),
                ),
                (x_chunks, valid),
            )
            centroids = sums / jnp.maximum(counts, 1.0)[:, None]
            return jnp.where((counts > 0)[:, None], centroids, e_n)

    e = jax.lax.fori_loop(0, iters, body, e)
    return normalize(e)


# ---------------------------------------------------------------------------
# CVQ-VAE online clustered reinitialisation
# ---------------------------------------------------------------------------


def cvq_decay(
    p: jax.Array, codebook_size: int, ema_decay: float, eps: float = 1e-3
) -> jax.Array:
    """Per-code retention factor: ``1 − exp(−p·K·10/(1−γ) − eps)``.

    Active codes (large p) → decay ≈ 1 (keep the old entry); dead codes
    (p ≈ 0) → decay ≈ eps (snap to the fresh anchor). Reference
    ``cvqvae/quantizer_callback.py:98-102``.
    """
    return 1.0 - jnp.exp(-p * codebook_size * 10.0 / (1.0 - ema_decay) - eps)


def nearest_anchors(
    x: jax.Array, d: jax.Array, key: jax.Array | None = None
) -> jax.Array:
    """Per code, the closest feature: anchors[k] = x[argmin_n d[n, k]]."""
    return x[jnp.argmin(d, axis=0)]


def multinomial_anchors(
    x: jax.Array, d: jax.Array, key: jax.Array = None
) -> jax.Array:
    """Per code, sample a feature ∝ softmax over distances (reference
    ``anchors.py:89-104`` — softmax of the raw distance, per its code)."""
    logits = d.T  # (K, N)
    idx = jax.random.categorical(key, logits, axis=-1)
    return x[idx]


def random_anchors(
    x: jax.Array, d: jax.Array, key: jax.Array = None
) -> jax.Array:
    """Random permutation/sample of features per code (CachedAnchor's core,
    without the cross-batch cache)."""
    k = d.shape[1]
    n = x.shape[0]
    if n >= k:
        idx = jax.random.choice(key, n, (k,), replace=n < k)
        return x[idx]
    missing = jax.random.uniform(key, (k - n, x.shape[1]), x.dtype)
    return jnp.concatenate([x, missing], axis=0)


def cached_anchors(
    x: jax.Array, d: jax.Array, key: jax.Array, cache: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """CachedAnchor (reference ``cvqvae/anchors.py:107-166``): anchors are a
    random sample of K rows from [this batch's features + the PREVIOUS
    step's anchors], padded with uniform noise when still short; the new
    anchors become the cache. TPU-native: the cache is a fixed (K, D) array
    carried in ``state.extra`` (the reference resizes a torch buffer), so
    shapes stay static under jit — the never-written-yet case is seeded by
    initialising the cache with uniform noise, matching the reference's
    missing-pad distribution on the first step.

    Returns (anchors, new_cache)."""
    k = d.shape[1]
    n = x.shape[0]
    noise_key, idx_key = jax.random.split(key)
    pool = jnp.concatenate([x, cache], axis=0) if n < k else x
    m = pool.shape[0]
    if m < k:
        missing = jax.random.uniform(noise_key, (k - m, x.shape[1]), x.dtype)
        pool = jnp.concatenate([pool, missing], axis=0)
        m = k
    if m == k:
        idx = jax.random.permutation(idx_key, k)
    else:
        idx = jax.random.choice(idx_key, m, (k,), replace=False)
    anchors = pool[idx]
    return anchors, jax.lax.stop_gradient(anchors)


_ANCHOR_FNS = {
    "nearest": nearest_anchors,
    "multinomial": multinomial_anchors,
    "random": random_anchors,
}  # "cached" is handled inline in cvq_update (carries a cache)


def cvq_update(
    codebook: jax.Array,
    p: jax.Array,
    x: jax.Array,
    d: jax.Array,
    codes: jax.Array,
    *,
    ema_decay: float,
    eps: float = 1e-3,
    anchor: str = "nearest",
    key: jax.Array | None = None,
    sync: bool = True,
    axis_name: str | None = None,
    anchor_cache: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """One CVQ-VAE codebook step →
    (new_codebook, new_probability, new_anchor_cache).

    Reference ``cvqvae/quantizer_callback.py:75-105`` + ``anchors.py:41-68``:
    synced code frequency → EMA probability; anchors chosen from (optionally
    all-gathered) features; per-code decay blends anchors into dead codes.
    With ``sync=False`` anchors are all-reduce-averaged instead (reference
    ``anchors.py:64-67``). ``anchor="cached"`` threads the cross-batch
    anchor cache (CachedAnchor); the returned cache is None otherwise.
    """
    x = x.reshape(-1, x.shape[-1])
    codes = codes.reshape(-1)
    freq = code_frequency(codes, codebook.shape[0], axis_name)
    p = ema(p, freq, ema_decay)

    if sync and axis_name:
        x = jax.lax.all_gather(x, axis_name).reshape(-1, x.shape[-1])
        d = jax.lax.all_gather(d, axis_name).reshape(-1, d.shape[-1])
    new_cache = None
    if anchor == "cached":
        if anchor_cache is None:
            raise ValueError("anchor='cached' requires anchor_cache")
        anchors, new_cache = cached_anchors(x, d, key, anchor_cache)
    else:
        anchors = _ANCHOR_FNS[anchor](x, d, key)
    if not sync and axis_name:
        anchors = jax.lax.pmean(anchors, axis_name)

    decay = cvq_decay(p, codebook.shape[0], ema_decay, eps)[:, None]
    new_codebook = ema(codebook, anchors, decay)
    return new_codebook.astype(codebook.dtype), p, new_cache


class CodebookState(NamedTuple):
    """Pytree bundling the non-gradient quantizer state threaded through the
    train step (replaces the reference's registered buffers)."""

    codebook: jax.Array
    probability: jax.Array | None = None  # CVQ EMA usage probability
    initialized: jax.Array | None = None  # lazy-init flag (k-means)
