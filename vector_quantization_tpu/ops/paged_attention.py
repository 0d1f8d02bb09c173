"""Pallas paged decode attention — single-token attention over a page pool.

The serving engine's XLA path materialises the gathered logical cache
(``paged_gather`` → ``(B, S, H, Dh)``) before the attention einsum, which
costs an extra write+read of the whole gathered cache per layer per step.
This kernel reads each slot's pages DIRECTLY from the pool (vLLM's paged
attention, TPU-shaped):

- grid ``(B, P_cap)`` — batch rows parallel, pages sequential (online
  softmax accumulates in scratch);
- the page id for grid step ``(b, p)`` comes from the scalar-prefetched
  page table, so the k/v DMAs fetch only the slot's ALLOCATED pages —
  pages beyond a slot's valid length map to the previous block index and
  the pipeline elides the duplicate fetch (no wasted bytes, per-row
  lengths honored — stronger than host-side bucket slicing, which reads
  every row up to the global max);
- per-page compute is elementwise multiply + reduce on the VPU with a
  flash-style (m, l, o) running softmax in VMEM scratch. Mosaic cannot
  lower the equivalent batched dot_generals (batch H, no free lhs dims),
  and an MXU head-segment-matrix variant measured 40x SLOWER end to end
  (tiny per-step dots are latency-bound); the simple VPU form sustains
  3000 eff tok/s at the serving recipe (page_size 64).

``paged_decode_attention(q (B, H, Dh), k_pool/v_pool (L, P, ps, H, Dh),
page_table (B, P_cap), lengths (B,), layer) → (B, H·Dh) f32``.

INT8 pools: pass ``k_scale_pool``/``v_scale_pool`` (L, P, ps, H) f32 — the
per-(position, head) max-abs scales ``ops/paged_kv.py`` wrote at update
time. The scale commutes with the Dh contraction (exactly as the dense
int8-KV cache proves, models/transformers/llama.py), so the kernel applies
``k_scale`` to the scores after the q·k reduce and folds ``v_scale`` into
the probs; the page DMAs stay int8-sized — this is what lets the 1.52x
int8-KV decode lever reach the paged serving path (VERDICT r3 #1).

The pool is passed WHOLE with the (static) layer index folded into the
index map — slicing ``pool[layer]`` in XLA would materialise a copy of the
layer's pool every step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["paged_decode_attention"]

_NEG = -1.0e30


def _kernel(
    table_ref,  # (B, P_cap) int32 scalar-prefetch
    len_ref,  # (B,) int32 scalar-prefetch
    q_ref,  # (1, H, Dh)
    k_ref,  # (1, 1, ps, H, Dh)
    v_ref,
    *rest,  # [ksc_ref, vsc_ref (1, 1, ps, H) f32,] out_ref, m/l/o scratch
    ps: int,
    scale: float,
    int8: bool,
):
    if int8:
        ksc_ref, vsc_ref, out_ref, m_ref, l_ref, o_ref = rest
    else:
        out_ref, m_ref, l_ref, o_ref = rest
    b = pl.program_id(0)
    p = pl.program_id(1)
    length = len_ref[b]
    last_valid = jnp.maximum((length - 1) // ps, 0)

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when((p <= last_valid) & (length > 0))
    def _():
        q = q_ref[0].astype(jnp.float32) * scale  # (H, Dh)
        k = k_ref[0, 0].astype(jnp.float32)  # (ps, H, Dh)
        v = v_ref[0, 0].astype(jnp.float32)
        # scores (ps, H) = sum_d q[h, d] * k[s, h, d]
        scores = jnp.sum(q[None, :, :] * k, axis=-1)
        if int8:
            scores = scores * ksc_ref[0, 0]  # per-(position, head) k scale
        pos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0)
        scores = jnp.where(pos < length, scores, _NEG)

        m_prev = m_ref[:]  # (1, H)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
        m_ref[:] = m_new
        alpha = jnp.exp(m_prev - m_new)  # (1, H)
        probs = jnp.exp(scores - m_new)  # (ps, H)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(probs, axis=0, keepdims=True)
        if int8:
            probs = probs * vsc_ref[0, 0]  # fold the v scale into the probs
        # o (H, Dh) = sum_s probs[s, h] * v[s, h, d]
        pv = jnp.sum(probs[:, :, None] * v, axis=0)
        o_ref[:] = o_ref[:] * alpha.reshape(-1, 1) + pv

    @pl.when(p == pl.num_programs(1) - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-9)  # idle rows: all masked
        out_ref[0] = (o_ref[:] / denom.reshape(-1, 1)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer", "interpret"))
def paged_decode_attention(
    q: jax.Array,  # (B, H, Dh)
    k_pool: jax.Array,  # (L, P, ps, H, Dh)
    v_pool: jax.Array,
    page_table: jax.Array,  # (B, P_cap) int32
    lengths: jax.Array,  # (B,) int32 — valid positions per row
    layer: int,
    *,
    k_scale_pool: jax.Array | None = None,  # (L, P, ps, H) f32 (int8 pools)
    v_scale_pool: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    b, h, dh = q.shape
    num_layers, num_pages, ps, hk, dhk = k_pool.shape
    assert (h, dh) == (hk, dhk)
    int8 = k_scale_pool is not None
    p_cap = page_table.shape[1]
    scale = 1.0 / (dh ** 0.5)

    grid = (b, p_cap)

    def page_index(bi, pi, table_ref, len_ref):
        # invalid pages re-map to the last valid page: same block index →
        # the pipeline skips the DMA
        last_valid = jnp.maximum((len_ref[bi] - 1) // ps, 0)
        pid = table_ref[bi, jnp.minimum(pi, last_valid)]
        return (layer, pid, 0, 0, 0)

    def scale_index(bi, pi, table_ref, len_ref):
        last_valid = jnp.maximum((len_ref[bi] - 1) // ps, 0)
        pid = table_ref[bi, jnp.minimum(pi, last_valid)]
        return (layer, pid, 0, 0)

    kernel = functools.partial(_kernel, ps=ps, scale=scale, int8=int8)
    in_specs = [
        pl.BlockSpec((1, h, dh), lambda bi, pi, t, ln: (bi, 0, 0)),
        pl.BlockSpec((1, 1, ps, h, dh), page_index),
        pl.BlockSpec((1, 1, ps, h, dh), page_index),
    ]
    operands = [q, k_pool, v_pool]
    if int8:
        in_specs += [
            pl.BlockSpec((1, 1, ps, h), scale_index),
            pl.BlockSpec((1, 1, ps, h), scale_index),
        ]
        operands += [k_scale_pool, v_scale_pool]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, h, dh), lambda bi, pi, t, ln: (bi, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((h, dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, lengths, *operands)
    return out.reshape(b, h * dh)
