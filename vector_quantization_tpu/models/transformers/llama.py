"""Llama-style AR decoder — the proposal-network transformer.

Behavioral reference: ``vq/algorithms/ar/transformers/llama.py:15-47`` (HF
``LlamaForCausalLM`` built from scratch: RMSNorm, rotary attention, SwiGLU
MLP, no biases; GPT-2-style N(0, 0.02) init with zeroed lm_head; medium =
24L/16H/1024d/2816ffn per ``configs/ar/transformers/llama.py:8-15``).

TPU-native design (replaces the reference's python ``while`` loop over HF
``past_key_values``, ``ar/transformers/base.py:41-56``):
- training forward: full-sequence causal attention (MXU einsums, bf16);
- generation: static-shape KV cache (one (B, L_max, H, Dh) pair per layer)
  with a jitted ``lax.scan`` decode loop — one compiled program for the
  entire image generation;
- ``tp_param_spec`` provides tensor-parallel PartitionSpecs (attention heads
  and FFN sharded over the ``tp`` mesh axis) — the north-star extension
  beyond the reference's DDP-only parallelism.

Weight layout matches HF Llama naming closely enough for a mechanical
torch→flax converter (tools/convert_checkpoints.py analogue).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from ...registries import TransformerRegistry

__all__ = ["LlamaTransformer", "KVCache", "Int8Dense", "quantize_params_int8", "fuse_llama_params", "llama_tp_param_spec", "make_dense_cache"]

_dense_init = nn.initializers.normal(0.02)


class KVCache(NamedTuple):
    """Static decode cache: k/v are PER-LAYER tuples of (B, L_max, H, Dh).

    Per-layer arrays (not one stacked (L, ...) array) because the
    continuous-batching slot path writes each token with a per-row scatter
    (`.at[rows, positions].set`), and XLA does not alias a scatter into a
    slice of a large stacked carry — it copies the whole stack every layer
    step. Measured on v5e at the serving shape (24L, b64, S321): stacked
    int8 scatter+read 5.07 ms/step vs per-layer 2.85 (bf16: 3.96 vs 4.18)
    — work_dirs/exp/exp_slot_int8_probe{,2}.py.

    With ``k_scale``/``v_scale`` set (per-layer (B, L_max, H)), k/v hold
    INT8 values quantised per (position, head) — halves the decode-dominant
    KV HBM traffic; the per-head scale commutes with the Dh contraction so
    attention applies it after the score matmul / folds it into the probs.
    """

    k: tuple[jax.Array, ...]
    v: tuple[jax.Array, ...]
    length: jax.Array  # () int32 — number of valid positions
    k_scale: tuple[jax.Array, ...] | None = None
    v_scale: tuple[jax.Array, ...] | None = None

    @property
    def window(self) -> int:
        """Cache rows per slot (the attention window)."""
        return self.k[0].shape[1]


class Int8Dense(nn.Module):
    """Weight-only INT8 linear (no bias): stores an int8 kernel + per-output
    f32 scale; dequantises at use. Halves/quarters the weight HBM traffic of
    the memory-bound decode step (the north-star INT8 weight-only AR path).
    Params convert from a float checkpoint via :func:`quantize_params_int8`.

    ``mode``: "auto" (measured-fastest backend default), "pallas", "xla"
    (weight-only, bit-identical outputs), or "w8a8" (native int8 MXU dot
    with dynamic per-row activation quantisation — fastest, small extra
    quantisation error).
    """

    features: int
    dtype: Any = jnp.bfloat16
    mode: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ...ops.int8_matmul import int8_matmul, int8_matmul_w8a8

        d = x.shape[-1]
        w_int8 = self.param(
            "w_int8",
            lambda key, shape: jax.random.randint(
                key, shape, -127, 128, jnp.int8
            ),
            (d, self.features),
        )
        scale = self.param(
            "scale", nn.initializers.constant(0.01), (self.features,), jnp.float32
        )
        if self.mode == "w8a8":
            return int8_matmul_w8a8(x, w_int8, scale).astype(x.dtype)
        use_pallas = None if self.mode == "auto" else (self.mode == "pallas")
        return int8_matmul(x, w_int8, scale, use_pallas=use_pallas).astype(
            x.dtype
        )


def quantize_params_int8(params: Any) -> Any:
    """Float Llama params → Int8Dense layout (per-output-channel symmetric
    max-abs scaling) for every projection kernel; embeddings/norms stay f32.

    Returns device arrays: host numpy leaves would be re-uploaded on every
    jitted call (~330 MB per generate for the medium model — measured 6×
    slower end-to-end through the device tunnel before this was fixed).
    """
    import numpy as np  # host-side conversion math

    def quant(w):
        w = np.asarray(w, np.float32)
        scale = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-8)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(scale.astype(np.float32))

    def convert(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if set(v) == {"kernel"} and k.endswith("_proj"):
                    q, scale = quant(v["kernel"])
                    out[k] = {"w_int8": q, "scale": scale}
                else:
                    out[k] = convert(v)
            elif k == "lm_head":
                q, scale = quant(v)
                out["lm_head_int8"] = q
                out["lm_head_scale"] = scale
            else:
                out[k] = v
        return out

    return convert(params)


def fuse_llama_params(params: Any) -> Any:
    """Unfused Llama params → the ``fused_qkv=True`` layout: q/k/v kernels
    concatenated into ``qkv_proj`` and gate/up into ``gateup_proj`` (works
    for float kernels and Int8Dense {w_int8, scale} — per-output-channel
    scales concatenate directly). A serving-time transform: checkpoints and
    converters keep the unfused HF-compatible layout."""

    def cat(entries):
        if "kernel" in entries[0]:
            return {
                "kernel": jnp.concatenate(
                    [e["kernel"] for e in entries], axis=1
                )
            }
        return {
            "w_int8": jnp.concatenate([e["w_int8"] for e in entries], axis=1),
            "scale": jnp.concatenate([e["scale"] for e in entries], axis=0),
        }

    out = {}
    for key, val in params.items():
        if isinstance(val, dict) and "q_proj" in val:
            layer = {
                k: v
                for k, v in val.items()
                if k not in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
            }
            layer["qkv_proj"] = cat(
                [val["q_proj"], val["k_proj"], val["v_proj"]]
            )
            layer["gateup_proj"] = cat([val["gate_proj"], val["up_proj"]])
            out[key] = layer
        else:
            out[key] = val
    return out


def make_dense_cache(
    num_layers: int,
    batch: int,
    rows: int,
    num_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    """Per-layer static cache with ``rows`` positions per slot (INT8 when
    ``dtype == jnp.int8``: int8 values + f32 per-(position, head) scales)."""
    shape = (batch, rows, num_heads, head_dim)
    if dtype == jnp.int8:
        return KVCache(
            k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(num_layers)),
            v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(num_layers)),
            length=jnp.zeros((), jnp.int32),
            k_scale=tuple(
                jnp.zeros(shape[:-1], jnp.float32) for _ in range(num_layers)
            ),
            v_scale=tuple(
                jnp.zeros(shape[:-1], jnp.float32) for _ in range(num_layers)
            ),
        )
    return KVCache(
        k=tuple(jnp.zeros(shape, dtype) for _ in range(num_layers)),
        v=tuple(jnp.zeros(shape, dtype) for _ in range(num_layers)),
        length=jnp.zeros((), jnp.int32),
    )


def _quant_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, T, H, Dh) → int8 values + per-(B, T, H) f32 max-abs scales."""
    xf = x.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / sc[..., None]), -127, 127).astype(jnp.int8)
    return q, sc


def _rope(x: jax.Array, positions: jax.Array, theta: float = 10000.0) -> jax.Array:
    """HF-style rotate-half RoPE. x: (B, T, H, Dh), positions: (B, T) or (T,)."""
    dh = x.shape[-1]
    freqs = theta ** (
        -jnp.arange(0, dh // 2, dtype=jnp.float32) / (dh // 2)
    )
    angles = positions[..., None].astype(jnp.float32) * freqs  # (..., T, Dh/2)
    cos = jnp.cos(angles)[..., None, :]  # (..., T, 1, Dh/2)
    sin = jnp.sin(angles)[..., None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def _flash_train_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, dtype: Any
) -> jax.Array:
    """Training-path causal attention via the Pallas TPU flash kernel.

    q/k/v: (B, T, H, Dh) post-RoPE. The XLA einsum path materialises the
    (B, H, T, T) f32 score/prob planes (~270 MB/layer at Llama-medium
    b64/257) twice in the forward and again in the dots-policy backward
    recompute; the flash kernel keeps them in VMEM tiles. Sequence is
    padded to a 128 multiple — with ``causal=True`` real query rows
    (< T) never read padded key columns, and padded rows' outputs are
    sliced off (their incoming cotangents are therefore zero, so padding
    contributes nothing to dq/dk/dv).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, t, h, dh = q.shape
    block = 128
    tp = -(-t // block) * block
    pad = [(0, 0), (0, tp - t), (0, 0), (0, 0)]
    qf = jnp.pad(q, pad).transpose(0, 2, 1, 3).astype(dtype)
    kf = jnp.pad(k, pad).transpose(0, 2, 1, 3).astype(dtype)
    vf = jnp.pad(v, pad).transpose(0, 2, 1, 3).astype(dtype)
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(
        qf, kf, vf, causal=True,
        sm_scale=float(dh) ** -0.5, block_sizes=sizes,
    )
    return out.transpose(0, 2, 1, 3)[:, :t]


class RMSNorm(nn.Module):
    eps: float = 1e-6  # HF LlamaConfig.rms_norm_eps default
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param(
            "scale", nn.initializers.ones, (x.shape[-1],), jnp.float32
        )
        x32 = x.astype(jnp.float32)
        norm = x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps
        )
        return (norm * scale).astype(self.dtype)


class LlamaBlock(nn.Module):
    num_heads: int
    ffn_dim: int
    dtype: Any = jnp.float32
    quantize: bool = False  # INT8 weight-only projections
    quantize_mode: str = "auto"
    fused_qkv: bool = False  # merged qkv / gate+up projections (decode)
    paged_kernel: bool | None = None  # Pallas paged attention (None = auto)
    flash: bool = False  # Pallas flash attention on the training forward

    def _dense(self, features: int, name: str):
        if self.quantize:
            return Int8Dense(
                features, dtype=self.dtype, mode=self.quantize_mode, name=name
            )
        return nn.Dense(
            features,
            use_bias=False,
            kernel_init=_dense_init,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        positions: jax.Array,
        mask: jax.Array,
        stacked_kv: tuple[jax.Array, jax.Array] | None = None,
        layer_idx: int = 0,
        offset: jax.Array | None = None,
    ):
        """x: (B, T, D). mask: (B, 1, T, S) additive. stacked_kv: the FULL
        stacked (L, B, L_max, H, Dh) k/v cache — the block scatters the
        current k/v at (layer_idx, :, offset) and returns the updated stack,
        so the update aliases in place when threaded through a lax.scan
        carry (one small write per step instead of a full-cache copy)."""
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        y = RMSNorm(dtype=self.dtype, name="input_norm")(x)
        if self.fused_qkv:
            # one (D, 3D) matmul instead of three: at decode batch sizes
            # each small matmul pays a fixed dispatch cost and underfills
            # the MXU; fusing recovers it (params via fuse_llama_params)
            qkv = self._dense(3 * d, "qkv_proj")(y)
            q, k, v = jnp.split(qkv, [d, 2 * d], axis=-1)
        else:
            q = self._dense(d, "q_proj")(y)
            k = self._dense(d, "k_proj")(y)
            v = self._dense(d, "v_proj")(y)
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, t, h, dh)
        v = v.reshape(b, t, h, dh)
        q = _rope(q, positions)
        k = _rope(k, positions)

        from ...ops.paged_kv import PagedKVCache, paged_gather, paged_update

        int8_kv = False
        if isinstance(stacked_kv, PagedKVCache):
            # paged pool: scatter this token per slot, then attend
            assert t == 1 and offset is not None and offset.ndim == 1
            stacked_kv = paged_update(
                stacked_kv, layer_idx, offset, k[:, 0], v[:, 0]
            )
            new_cache = stacked_kv
            use_kernel = self.paged_kernel
            if use_kernel is None:
                use_kernel = jax.default_backend() == "tpu"
            if use_kernel:
                # Pallas paged attention: reads each slot's allocated pages
                # straight from the pool with per-row valid lengths — the
                # gather path materialises the (B, S, H, Dh) logical cache
                # (an extra write+read of the whole window per layer) and
                # reads the global-max bucket for every row. Not used under
                # tensor-sharded caches (a pallas call on sharded operands
                # would force replication) — ARServer disables it then.
                from ...ops.paged_attention import paged_decode_attention

                attn = paged_decode_attention(
                    q[:, 0],
                    stacked_kv.k,
                    stacked_kv.v,
                    stacked_kv.page_table,
                    offset + 1,
                    layer_idx,
                    k_scale_pool=stacked_kv.k_scale,
                    v_scale_pool=stacked_kv.v_scale,
                    # explicit paged_kernel=True off-TPU (tests) interprets
                    interpret=jax.default_backend() != "tpu",
                )
                attn = attn.astype(self.dtype).reshape(b, 1, d)
                x = x + self._dense(d, "o_proj")(attn)
                return self._ffn(x), new_cache
            k_att, v_att, k_sc_g, v_sc_g = paged_gather(stacked_kv, layer_idx)
            k_att = k_att.astype(self.dtype)
            v_att = v_att.astype(self.dtype)
            if k_sc_g is not None:
                # INT8 pool through the XLA gather path: same scale
                # placement as the dense int8-KV cache below
                int8_kv = True
                k_sc_b = k_sc_g.transpose(0, 2, 1)[:, :, None, :]
                v_sc_b = v_sc_g.transpose(0, 2, 1)[:, :, None, :]
        elif stacked_kv is not None:
            # per-layer arrays: k/v (B, S, H, Dh), scales (B, S, H)
            int8_kv = len(stacked_kv) == 4
            if int8_kv:
                # INT8 KV: per-(position, head) max-abs scales; the scale
                # commutes with the Dh contraction so attention re-applies
                # it after the score matmul / folds it into the probs —
                # the cache read stays int8-sized
                k_all, v_all, k_sc_all, v_sc_all = stacked_kv
                k_w, k_s = _quant_kv(k)
                v_w, v_s = _quant_kv(v)
            else:
                k_all, v_all = stacked_kv
                k_w, v_w = k, v
            if offset is not None and getattr(offset, "ndim", 0) == 1:
                # per-slot positions (continuous batching): t == 1, each
                # batch row writes its own cache position. Scatter on the
                # per-layer array aliases in place (a stacked-carry scatter
                # would copy the whole stack — see KVCache docstring).
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
                    k_all,
                    k_w.astype(k_all.dtype),
                    (zero, offset, zero, zero),
                )
                v_all = jax.lax.dynamic_update_slice(
                    v_all,
                    v_w.astype(v_all.dtype),
                    (zero, offset, zero, zero),
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
                # (B, S, H) → (B, H, 1, S) broadcast over query positions
                k_sc_b = k_sc_all.transpose(0, 2, 1)[:, :, None, :]
                v_sc_b = v_sc_all.transpose(0, 2, 1)[:, :, None, :]
            else:
                new_cache = (k_all, v_all)
        else:
            k_att, v_att = k, v
            new_cache = None
            if self.flash and t > 1:
                attn = _flash_train_attention(q, k, v, self.dtype)
                attn = attn.reshape(b, t, d)
                x = x + self._dense(d, "o_proj")(attn)
                return self._ffn(x), None

        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k_att, preferred_element_type=jnp.float32
        ) / jnp.sqrt(dh)
        if int8_kv:
            scores = scores * k_sc_b
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1)
        if int8_kv:
            probs = probs * v_sc_b
        probs = probs.astype(self.dtype)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v_att)
        attn = attn.reshape(b, t, d)
        x = x + self._dense(d, "o_proj")(attn)
        return self._ffn(x), new_cache

    def _ffn(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        y = RMSNorm(dtype=self.dtype, name="post_norm")(x)
        if self.fused_qkv:
            gu = self._dense(2 * self.ffn_dim, "gateup_proj")(y)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = self._dense(self.ffn_dim, "gate_proj")(y)
            up = self._dense(self.ffn_dim, "up_proj")(y)
        y = nn.silu(gate) * up
        return x + self._dense(d, "down_proj")(y)


@TransformerRegistry.register()
class LlamaTransformer(nn.Module):
    vocabulary_size: int
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 2816
    max_length: int = 1024
    dtype: Any = jnp.float32
    quantize: bool = False  # INT8 weight-only projections (decode serving)
    quantize_mode: str = "auto"  # "auto" | "pallas" | "xla" | "w8a8"
    fused_qkv: bool = False  # serve with merged qkv/gate+up projections
    paged_kernel: bool | None = None  # Pallas paged attention (None = auto)
    remat: bool = False  # per-block rematerialisation in the training
    # forward: without it the saved (B, H, T, T) score/prob residuals of
    # all layers OOM a 16 GB chip at Llama-medium b32/257 (reference
    # recipe is global batch 256); with it only block inputs are saved
    remat_policy: str | None = None  # None = full per-block remat;
    # "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
    # projection matmul outputs are SAVED (~354 MB/layer bf16 at b64) and
    # only attention scores/softmax/elementwise recompute — the backward
    # re-runs ~4% of the block's FLOPs instead of ~33%, trading HBM for
    # MFU (the attention residuals stay unsaved either way)
    flash: bool = False  # training-forward attention via the Pallas TPU
    # flash kernel (fwd + custom-vjp bwd): avoids materialising the
    # (B, H, T, T) f32 score/prob planes that the einsum path writes in
    # the forward and again in the remat backward. Decode paths ignore it.
    head_dtype: Any = None  # lm_head matmul operand dtype (None = f32,
    # the reference's autocast-off numerics). bf16 runs the (B·T, D) x
    # (D, V) head einsum on the MXU's bf16 path with f32 accumulation —
    # ~4x the f32 matmul rate at Llama-medium's 17k-wide vocab head.
    fused_ce_chunk: int = 2048  # vocab chunk of the logits-free CE path
    # (the fused_ce_targets kwarg of __call__; see ops/fused_ce.py)

    # RoPE is relative, so the shared-column serving engine's column
    # recentering preserves logits (see __call__ row_starts); absolute
    # learned-position models (GPT-2) must use the per-row scatter path
    supports_shared_column = True
    # the fused_ce_targets training loss (ops/fused_ce.py) is wired into
    # __call__; ARAlgorithm checks this before using it (GPT-2 lacks it)
    supports_fused_ce = True

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        cache: KVCache | None = None,
        slot_positions: jax.Array | None = None,
        row_starts: jax.Array | None = None,
        fused_ce_targets: jax.Array | None = None,
    ):
        """Training/prefill: tokens (B, T) → logits (B, T, V).

        With ``fused_ce_targets`` (B, T) int (training only, no cache):
        returns the SCALAR teacher-forced next-token CE computed by the
        logits-free chunked head (``ops/fused_ce.py``) — position t
        predicts targets[:, t+1]; the (B, T, V) logits never exist.

        With ``cache``: incremental decode — tokens are the NEW positions
        (cache.length gives the offset); returns (logits, new_cache).

        With ``slot_positions`` (B,) int32 (requires cache and T == 1):
        continuous-batching mode — every batch slot decodes at its OWN
        position (new requests prefill at 0 while others are mid-image).
        Each row's KV is scattered at its own cache column.

        With ``row_starts`` (B,) int32 (requires cache, scalar-offset
        decode): SHARED-COLUMN continuous batching — every row writes its
        KV at the same cache column (``cache.length``), but row b's
        stream logically began at column ``row_starts[b]``, so its
        attention is masked to columns ``[row_starts[b], length]``. RoPE
        is rotated by the shared cache column: rotation is relative
        (q at col t vs k at col c depends only on t−c = the true
        sequence distance for every row), so logits match the per-row
        ``slot_positions`` path up to fp rounding while keeping the
        scalar-offset dynamic-update-slice cache writes — the per-row
        scatter form defeats XLA's convert+dot fusion and reads the
        attention window ~2x slower on v5e (work_dirs/exp/
        exp_perrow_ablate.py).
        """
        b, t = tokens.shape
        if row_starts is not None:
            assert cache is not None and slot_positions is None, (
                "row_starts requires the scalar-offset cache decode"
            )
        emb = self.param(
            "embedding",
            _dense_init,
            (self.vocabulary_size, self.hidden_size),
            jnp.float32,
        )
        x = emb[tokens].astype(self.dtype)

        from ...ops.paged_kv import PagedKVCache

        paged = isinstance(cache, PagedKVCache)
        if cache is None:
            positions = jnp.broadcast_to(jnp.arange(t), (b, t))
            # causal mask
            causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
            mask = jnp.where(causal, 0.0, -1e9)[None, None]
            offset = None
        elif slot_positions is not None:
            assert t == 1, "slot_positions requires single-token decode"
            positions = slot_positions[:, None]  # (B, 1)
            s = cache.logical_length if paged else cache.window
            col = jnp.arange(s)[None, None, None, :]  # (1,1,1,S)
            row = slot_positions[:, None, None, None]  # (B,1,1,1)
            mask = jnp.where(col <= row, 0.0, -1e9)
            offset = slot_positions
        else:
            assert not paged, "paged cache requires slot_positions decode"
            offset = cache.length
            positions = jnp.broadcast_to(jnp.arange(t) + offset, (b, t))
            # attend to all cache positions < offset + current causal block
            s = cache.window  # L_max
            col = jnp.arange(s)[None, :]
            row = jnp.arange(t)[:, None] + offset
            mask = jnp.where(col <= row, 0.0, -1e9)[None, None]
            if row_starts is not None:
                # shared-column batching: row b must not read cache
                # columns before its stream's first column
                start_ok = (
                    jnp.arange(s)[None, None, None, :]
                    >= row_starts[:, None, None, None]
                )
                mask = jnp.where(start_ok, mask, -1e9)
        int8_cache = (
            cache is not None and not paged and cache.k_scale is not None
        )
        if not paged and cache is not None:
            k_list, v_list = list(cache.k), list(cache.v)
            ks_list = list(cache.k_scale) if int8_cache else None
            vs_list = list(cache.v_scale) if int8_cache else None
        stacked = cache if paged else None
        block_cls = LlamaBlock
        if self.remat and cache is None:
            # training forward only (decode's tiny per-token steps don't
            # benefit and the cache threading would defeat the saving)
            if self.remat_policy == "dots":
                block_cls = nn.remat(
                    LlamaBlock,
                    policy=jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable,
                )
            elif self.remat_policy is None:
                block_cls = nn.remat(LlamaBlock)
            else:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r}"
                )
        for i in range(self.num_layers):
            if not paged and cache is not None:
                # per-layer arrays (see KVCache docstring: a stacked carry
                # would turn every slot scatter into a full-stack copy)
                if int8_cache:
                    stacked = (k_list[i], v_list[i], ks_list[i], vs_list[i])
                else:
                    stacked = (k_list[i], v_list[i])
            x, stacked_new = block_cls(
                num_heads=self.num_heads,
                ffn_dim=self.ffn_dim,
                dtype=self.dtype,
                quantize=self.quantize,
                quantize_mode=self.quantize_mode,
                fused_qkv=self.fused_qkv,
                paged_kernel=self.paged_kernel,
                flash=self.flash,
                name=f"layer{i}",
            )(x, positions, mask, stacked, i, offset)
            if stacked_new is not None:
                if paged:
                    stacked = stacked_new
                else:
                    k_list[i], v_list[i] = stacked_new[0], stacked_new[1]
                    if int8_cache:
                        ks_list[i], vs_list[i] = (
                            stacked_new[2],
                            stacked_new[3],
                        )

        x = RMSNorm(dtype=self.dtype, name="final_norm")(x)
        if fused_ce_targets is not None:
            assert cache is None and not self.quantize, (
                "fused_ce_targets is a training-path loss (no cache, "
                "fp head)"
            )
            from ...ops.fused_ce import fused_next_token_ce

            lm_head = self.param(
                "lm_head",
                nn.initializers.zeros,  # reference zeroes the head
                (self.hidden_size, self.vocabulary_size),
                jnp.float32,
            )
            # clamp the chunk to the vocab's 128-multiple: a tiny vocab
            # (e.g. the 75-token regression anchor) would otherwise pad
            # its single chunk to the full 2048 lanes — 27x wasted head
            # work per step
            chunk = min(
                self.fused_ce_chunk,
                -(-self.vocabulary_size // 128) * 128,
            )
            return fused_next_token_ce(
                x, lm_head, fused_ce_targets, chunk
            )
        if self.quantize:
            # INT8 lm_head: at 17k vocab x 1024 dim the f32 head is ~20% of
            # the remaining per-step HBM traffic once projections are INT8
            from ...ops.int8_matmul import int8_matmul, int8_matmul_w8a8

            w_int8 = self.param(
                "lm_head_int8",
                nn.initializers.zeros,  # reference zeroes the head
                (self.hidden_size, self.vocabulary_size),
                jnp.int8,
            )
            head_scale = self.param(
                "lm_head_scale",
                nn.initializers.zeros,
                (self.vocabulary_size,),
                jnp.float32,
            )
            xh = x.reshape(b * t, self.hidden_size).astype(self.dtype)
            if self.quantize_mode == "w8a8":
                logits = int8_matmul_w8a8(xh, w_int8, head_scale)
            else:
                use_pallas = (
                    None
                    if self.quantize_mode == "auto"
                    else (self.quantize_mode == "pallas")
                )
                logits = int8_matmul(
                    xh, w_int8, head_scale, use_pallas=use_pallas
                )
            logits = logits.reshape(b, t, self.vocabulary_size)
        else:
            lm_head = self.param(
                "lm_head",
                nn.initializers.zeros,  # reference zeroes the head
                (self.hidden_size, self.vocabulary_size),
                jnp.float32,
            )
            hd = self.head_dtype or jnp.float32
            logits = jnp.einsum(
                "btd,dv->btv",
                x.astype(hd),
                lm_head.astype(hd),
                preferred_element_type=jnp.float32,
            )
        if paged:
            return logits, stacked  # updated PagedKVCache
        if cache is not None:
            new_cache = KVCache(
                k=tuple(k_list),
                v=tuple(v_list),
                length=cache.length + t,
                k_scale=tuple(ks_list) if int8_cache else None,
                v_scale=tuple(vs_list) if int8_cache else None,
            )
            return logits, new_cache
        return logits

    def init_cache(self, batch: int, dtype=jnp.bfloat16) -> KVCache:
        dh = self.hidden_size // self.num_heads
        return make_dense_cache(
            self.num_layers, batch, self.max_length, self.num_heads, dh, dtype
        )

    def init_paged_cache(
        self,
        batch: int,
        num_pages: int,
        page_size: int,
        pages_per_slot: int,
        dtype=jnp.bfloat16,
    ):
        from ...ops.paged_kv import init_paged_cache

        return init_paged_cache(
            self.num_layers,
            num_pages,
            page_size,
            batch,
            pages_per_slot,
            self.num_heads,
            self.hidden_size // self.num_heads,
            dtype,
        )


def llama_tp_param_spec(path: tuple, leaf, axis: str = "tp") -> P:
    """Tensor-parallel sharding rules (Megatron-style): q/k/v/gate/up column-
    parallel, o/down row-parallel, embeddings/lm_head vocab-sharded."""
    keys = [getattr(p, "key", None) for p in path]
    name = "/".join(str(k) for k in keys if k is not None)
    if any(
        k in name
        for k in (
            "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
            "qkv_proj", "gateup_proj",
        )
    ):
        return P(None, axis)
    if any(k in name for k in ("o_proj", "down_proj")):
        return P(axis, None)
    if name.endswith("embedding"):
        return P(axis, None)
    if name.endswith("lm_head") or name.endswith("lm_head_int8"):
        return P(None, axis)
    if name.endswith("lm_head_scale"):
        return P(axis)
    return P()
