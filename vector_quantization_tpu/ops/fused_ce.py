"""Fused (logits-free) softmax cross-entropy over a large vocabulary.

The AR trainer's teacher-forced loss is CE over a V≈17k vocabulary at
N = B·T ≈ 16k rows (reference loss: HF CausalLM ``labels=`` CE,
``vq/algorithms/ar/transformers/hf.py:50-58``). Materialising the
(N, V) f32 logits plus the log-softmax residual costs ~3.3 GB of HBM at
Llama-medium b64/257 — and on a 16 GB chip that sits on top of ~8.5 GB
of dots-policy remat residuals and ~5.4 GB of params/optimizer state,
degrading XLA's schedule far beyond the op's own cost: the r5 ablation
(work_dirs/exp/exp_ar_mfu_ablate_r5.py) measured the dense head+CE
complex at ~500 ms of a 920 ms step, while the SAME op in isolation
runs in 11 ms (work_dirs/exp/exp_ar_opt_r5.py).

``fused_ce`` computes the loss with an online (flash-style) logsumexp
over vocabulary chunks: the head matmul runs chunk-by-chunk inside a
``lax.scan``, each (N, chunk) logits block lives only for its scan step,
and the backward recomputes the block from the saved (x, w, lse) — one
extra pass of head FLOPs (~0.6 TFLOP at these shapes, ~3 ms on the MXU)
in exchange for never holding the logits. Matmuls run on the MXU bf16
path with f32 accumulation. The r5 probe measured it numerically exact
against the dense f32 path (loss equal to 5 decimals, grad max-abs-diff
1.3e-9 on grads of max-abs 6.9e-4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_ce", "fused_next_token_ce"]


def _chunked(w: jax.Array, chunk: int) -> tuple[jax.Array, int]:
    """(D, V) weights -> (nc, D, chunk) zero-padded chunk stack."""
    d, v = w.shape
    nc = -(-v // chunk)
    wp = jnp.pad(w, ((0, 0), (0, nc * chunk - v)))
    return wp.reshape(d, nc, chunk).transpose(1, 0, 2), nc


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ce(x, w, targets, chunk: int = 2048):
    """Mean CE of softmax(x @ w) against integer ``targets``.

    x: (N, D) activations (any float dtype; matmuls run bf16/f32-acc).
    w: (D, V) head weights. targets: (N,) int32 in [0, V).
    Equivalent to ``-mean(log_softmax(x @ w)[i, targets[i]])`` without
    materialising the (N, V) logits.
    """
    loss, _ = _fused_ce_fwd(x, w, targets, chunk)
    return loss


def _block(xb, wi, ci, chunk, v):
    logits = jnp.dot(
        xb, wi.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    cols = ci * chunk + jnp.arange(chunk)
    return jnp.where(cols[None, :] < v, logits, -1e30), cols


def _fused_ce_fwd(x, w, targets, chunk):
    v = w.shape[1]
    wc, nc = _chunked(w, chunk)
    xb = x.astype(jnp.bfloat16)
    n = x.shape[0]

    def body(carry, args):
        m, s, tlog = carry
        wi, ci = args
        logits, cols = _block(xb, wi, ci, chunk, v)
        m_c = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, m_c)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1
        )
        in_c = (targets >= ci * chunk) & (targets < (ci + 1) * chunk)
        idx = jnp.clip(targets - ci * chunk, 0, chunk - 1)
        t_here = jnp.take_along_axis(logits, idx[:, None], 1)[:, 0]
        tlog = jnp.where(in_c, t_here, tlog)
        return (m_new, s, tlog), None

    init = (
        jnp.full((n,), -1e30, jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    (m, s, tlog), _ = jax.lax.scan(body, init, (wc, jnp.arange(nc)))
    lse = m + jnp.log(s)
    loss = jnp.mean(lse - tlog)
    return loss, (x, w, targets, lse)


def _fused_ce_bwd(chunk, res, g):
    x, w, targets, lse = res
    d, v = w.shape
    n = x.shape[0]
    wc, nc = _chunked(w, chunk)
    xb = x.astype(jnp.bfloat16)
    scale = g / n

    def body(dx, args):
        wi, ci = args
        logits, cols = _block(xb, wi, ci, chunk, v)
        p = jnp.exp(logits - lse[:, None])
        onehot = (targets[:, None] == cols[None, :]).astype(jnp.float32)
        dlog = (p - onehot) * scale
        dlogb = dlog.astype(jnp.bfloat16)
        dx = dx + jnp.dot(
            dlogb, wi.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        dwi = jnp.dot(xb.T, dlogb, preferred_element_type=jnp.float32)
        return dx, dwi

    dx, dwc = jax.lax.scan(
        body, jnp.zeros((n, d), jnp.float32), (wc, jnp.arange(nc))
    )
    dw = dwc.transpose(1, 0, 2).reshape(d, nc * chunk)[:, :v]
    return dx.astype(x.dtype), dw.astype(w.dtype), None


fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def fused_next_token_ce(
    hidden: jax.Array, w: jax.Array, tokens: jax.Array, chunk: int = 2048
) -> jax.Array:
    """Teacher-forced next-token CE from PRE-HEAD hidden states.

    hidden: (B, T, D) final-norm outputs; w: (D, V); tokens: (B, T).
    Matches ``next_token_ce(einsum(hidden, w), tokens)`` — position t's
    hidden predicts tokens[:, t+1] — without materialising logits.
    """
    b, t, d = hidden.shape
    x = hidden[:, :-1].reshape(b * (t - 1), d)
    targets = tokens[:, 1:].reshape(b * (t - 1)).astype(jnp.int32)
    return fused_ce(x, w, targets, chunk)
