"""Ablate the per-row (staggered) decode path: scatter vs mask cost.

Patches LlamaBlock with timing-only variants (WRONG numerics — perf
signal only). r4 results on v5e (64 rows, window 256, ms/step):

- baseline (per-row scatter + per-row mask, bf16): 7.04
- noscatter (read-only cache):                     3.70
- scalarmask (scatter, aligned-style mask):        6.69
- flatscatter (2D-view scatter):                  15.11
- uniq (unique_indices/sorted hints):              7.03
- tposed (cache stored (B, H, Dh, S)):             7.09
- ring (uniform-head dus + wrapped mask, bf16):    6.75
- baseline_i8 / ring_i8:                     6.77 / 6.42

Conclusion: the in-scan cache WRITE (any form — scatter, dus at a
traced head, any layout) costs ~3 ms/step at this shape; HLO shows XLA
round-tripping the cache between the scatter's layout and the attention
fusion's S-minor layout (48 full-cache copies per step). Only the
scalar-offset form (generate / ARServer's aligned fast path) avoids it.
Staggered continuous batching therefore runs ~1.4-1.65x slower than
aligned waves; the server auto-detects and uses the aligned path whenever
every active row shares one position.

Usage: python work_dirs/exp/exp_perrow_ablate.py MODE
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import vector_quantization_tpu.models.transformers.llama as llama_mod
from vector_quantization_tpu.tasks.sequence_modeling import TokenCodebook
from vector_quantization_tpu.tasks.serving import ARServer

B, K, WINDOW = 64, 64, 256
AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)


def main(mode):
    import flax.linen as nn

    class AblatedBlock(llama_mod.LlamaBlock):
        MODE = mode

        @nn.compact
        def __call__(self, x, positions, mask, stacked_kv, layer_idx=0,
                     offset=None):
            b, t, d = x.shape
            h = self.num_heads
            dh = d // h
            y = llama_mod.RMSNorm(dtype=self.dtype, name="input_norm")(x)
            if self.fused_qkv:
                qkv = self._dense(3 * d, "qkv_proj")(y)
                q, k, v = jnp.split(qkv, [d, 2 * d], axis=-1)
            else:
                q = self._dense(d, "q_proj")(y)
                k = self._dense(d, "k_proj")(y)
                v = self._dense(d, "v_proj")(y)
            q = q.reshape(b, t, h, dh)
            k = k.reshape(b, t, h, dh)
            v = v.reshape(b, t, h, dh)
            q = llama_mod._rope(q, positions)
            k = llama_mod._rope(k, positions)

            if self.MODE == "tposed" and stacked_kv is not None:
                # cache stored (B, H, Dh, S): the scatter's standard layout
                # IS S-minor — exactly what the attention multiply-reduce
                # wants, so no per-layer layout copies
                k_all, v_all = stacked_kv
                rows = jnp.arange(b)
                k_all = k_all.at[rows, :, :, offset].set(
                    k[:, 0].astype(k_all.dtype)  # (B, H, Dh)
                )
                v_all = v_all.at[rows, :, :, offset].set(
                    v[:, 0].astype(v_all.dtype)
                )
                scores = jnp.einsum(
                    "bthd,bhds->bhts", q, k_all.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(dh)
                probs = jax.nn.softmax(scores + mask, axis=-1).astype(
                    self.dtype
                )
                attn = jnp.einsum(
                    "bhts,bhds->bthd", probs, v_all.astype(self.dtype)
                ).reshape(b, t, d)
                x = x + self._dense(d, "o_proj")(attn)
                return self._ffn(x), (k_all, v_all)
            if self.MODE == "ring_i8" and stacked_kv is not None:
                # ring-dus with INT8 cache + per-(position, head) scales
                k_all, v_all, ksc, vsc = stacked_kv
                s = k_all.shape[1]
                head = offset[0] % s
                kq, ks = llama_mod._quant_kv(k)
                vq_, vs = llama_mod._quant_kv(v)
                k_all = jax.lax.dynamic_update_slice(
                    k_all, kq[:, :1], (0, head, 0, 0)
                )
                v_all = jax.lax.dynamic_update_slice(
                    v_all, vq_[:, :1], (0, head, 0, 0)
                )
                ksc = jax.lax.dynamic_update_slice(
                    ksc, ks[:, :1], (0, head, 0)
                )
                vsc = jax.lax.dynamic_update_slice(
                    vsc, vs[:, :1], (0, head, 0)
                )
                col = jnp.arange(s)[None, None, None, :]
                pos_b = offset[:, None, None, None]
                delta = (head - pos_b) % s
                rel = (col - delta) % s
                mask = jnp.where(rel <= pos_b, 0.0, -1e9)
                scores = jnp.einsum(
                    "bthd,bshd->bhts", q, k_all.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(dh)
                scores = scores * ksc.transpose(0, 2, 1)[:, :, None, :]
                probs = jax.nn.softmax(scores + mask, axis=-1)
                probs = probs * vsc.transpose(0, 2, 1)[:, :, None, :]
                probs = probs.astype(self.dtype)
                attn = jnp.einsum(
                    "bhts,bshd->bthd", probs, v_all.astype(self.dtype)
                ).reshape(b, t, d)
                x = x + self._dense(d, "o_proj")(attn)
                return self._ffn(x), (k_all, v_all, ksc, vsc)
            if self.MODE == "ring" and stacked_kv is not None:
                # ring-phase cache: every row writes at the SAME scalar
                # head (dus — no scatter, no layout copies); per-row
                # validity via a wrapped-interval mask
                k_all, v_all = stacked_kv
                s = k_all.shape[1]
                head = offset[0] % s  # scalar (uniform by construction)
                k_all = jax.lax.dynamic_update_slice(
                    k_all, k[:, :1].astype(k_all.dtype),
                    (0, head, 0, 0),
                )
                v_all = jax.lax.dynamic_update_slice(
                    v_all, v[:, :1].astype(v_all.dtype),
                    (0, head, 0, 0),
                )
                col = jnp.arange(s)[None, None, None, :]
                pos_b = offset[:, None, None, None]
                delta = (head - pos_b) % s
                rel = (col - delta) % s
                mask = jnp.where(rel <= pos_b, 0.0, -1e9)
                scores = jnp.einsum(
                    "bthd,bshd->bhts", q, k_all.astype(self.dtype),
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(dh)
                probs = jax.nn.softmax(scores + mask, axis=-1).astype(
                    self.dtype
                )
                attn = jnp.einsum(
                    "bhts,bshd->bthd", probs, v_all.astype(self.dtype)
                ).reshape(b, t, d)
                x = x + self._dense(d, "o_proj")(attn)
                return self._ffn(x), (k_all, v_all)
            if stacked_kv is None:  # init path
                scores = jnp.einsum(
                    "bthd,bshd->bhts", q, k,
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(dh)
                probs = jax.nn.softmax(scores + mask, axis=-1).astype(
                    self.dtype
                )
                attn = jnp.einsum("bhts,bshd->bthd", probs, v)
                x = x + self._dense(d, "o_proj")(
                    attn.reshape(b, t, d)
                )
                return self._ffn(x), None
            k_all, v_all = stacked_kv
            rows = jnp.arange(b)
            if self.MODE == "flatscatter":
                s = k_all.shape[1]
                flat_idx = rows * s + offset
                kf = k_all.reshape(b * s, h * dh)
                vf = v_all.reshape(b * s, h * dh)
                kf = kf.at[flat_idx].set(
                    k[:, 0].reshape(b, h * dh).astype(kf.dtype)
                )
                vf = vf.at[flat_idx].set(
                    v[:, 0].reshape(b, h * dh).astype(vf.dtype)
                )
                k_all = kf.reshape(b, s, h, dh)
                v_all = vf.reshape(b, s, h, dh)
            elif self.MODE == "uniq":
                k_all = k_all.at[rows, offset].set(
                    k[:, 0].astype(k_all.dtype),
                    unique_indices=True, indices_are_sorted=True,
                )
                v_all = v_all.at[rows, offset].set(
                    v[:, 0].astype(v_all.dtype),
                    unique_indices=True, indices_are_sorted=True,
                )
            elif self.MODE != "noscatter":
                k_all = k_all.at[rows, offset].set(
                    k[:, 0].astype(k_all.dtype)
                )
                v_all = v_all.at[rows, offset].set(
                    v[:, 0].astype(v_all.dtype)
                )
            k_att = k_all.astype(self.dtype)
            v_att = v_all.astype(self.dtype)
            if self.MODE == "scalarmask":
                s = k_all.shape[1]
                col = jnp.arange(s)[None, None, None, :]
                mask = jnp.where(col <= offset[0], 0.0, -1e9)  # (1,1,1,S)
            scores = jnp.einsum(
                "bthd,bshd->bhts", q, k_att,
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(dh)
            scores = scores + mask
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            attn = jnp.einsum("bhts,bshd->bthd", probs, v_att)
            attn = attn.reshape(b, t, d)
            x = x + self._dense(d, "o_proj")(attn)
            return self._ffn(x), (k_all, v_all)

    if mode not in ("baseline", "baseline_i8"):
        llama_mod.LlamaBlock = AblatedBlock
    if mode == "tposed":
        # cache stored (B, H, Dh, S): window is the LAST dim
        llama_mod.KVCache.window = property(
            lambda self: self.k[0].shape[-1]
        )

    tr = llama_mod.LlamaTransformer(
        vocabulary_size=17385, max_length=WINDOW + K,
        dtype=jnp.bfloat16, fused_qkv=True, **AR_CFG,
    )
    params = tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    params = llama_mod.fuse_llama_params(params)
    cb = TokenCodebook(1001, 16384)
    if mode == "tposed":
        from vector_quantization_tpu.models.transformers.sampling import (
            sample_tokens,
        )

        L, H, DH = AR_CFG["num_layers"], AR_CFG["num_heads"], 64
        cache = llama_mod.KVCache(
            k=tuple(
                jnp.zeros((B, H, DH, WINDOW), jnp.bfloat16)
                for _ in range(L)
            ),
            v=tuple(
                jnp.zeros((B, H, DH, WINDOW), jnp.bfloat16)
                for _ in range(L)
            ),
            length=jnp.zeros((), jnp.int32),
        )
        positions = np.zeros(B, np.int32)
        positions[: B // 2] = 128
        positions[B // 2 :] = 129
        tokens = jnp.full((B,), cb.start + 5, jnp.int32)

        def decode(params, cache, tokens, positions, key):
            def body(carry, sk):
                cache, tokens, positions = carry
                logits, cache = tr.apply(
                    {"params": params}, tokens[:, None], cache,
                    slot_positions=positions,
                )
                logits = logits[:, -1]
                mixed = -0.75 * logits[0::2] + 1.75 * logits[1::2]
                tok = sample_tokens(
                    sk, mixed, cb.start, cb.end,
                    temperature=1.0, top_k=600, top_p=0.92,
                )
                tok = jnp.repeat(tok, 2, axis=0)
                return (cache, tok, positions + 1), tok

            keys = jax.random.split(key, K)
            (cache, tokens, positions), toks = jax.lax.scan(
                body, (cache, tokens, positions), keys
            )
            return toks, cache

        fn = jax.jit(decode, donate_argnums=(1,))
        toks, cache = fn(params, cache, tokens, jnp.asarray(positions),
                         jax.random.PRNGKey(0))
        np.asarray(toks)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            toks, cache = fn(params, cache, tokens, jnp.asarray(positions),
                             jax.random.PRNGKey(i + 1))
            np.asarray(toks)
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[1]
        print(f"RESULT {mode}: {t / K * 1e3:.2f} ms/step (window {WINDOW})",
              flush=True)
        return

    server = ARServer(
        tr, params, cb, image_tokens=256, batch_slots=B,
        sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
        cfg_alpha=1.75, uncond_token=1000, steps_per_sync=K,
        cache_dtype=jnp.int8 if mode.endswith('_i8') else jnp.bfloat16,
        aligned=False,
    )
    for i in range(server.num_requests_slots):
        server.submit(category=i % 1000)
    server._fill_slots()
    # force STAGGERED positions (per-row path, window 256): rows at
    # two different phases like steady continuous batching
    server.positions[: B // 2] = 128
    server.positions[B // 2 :] = 129
    server._resize_window(WINDOW)
    cache = server.cache
    toks, cache, tk, pos = server._decode(
        server.params, cache, server._put(server.tokens),
        server._put(server.positions), jax.random.PRNGKey(0),
    )
    np.asarray(toks)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        toks, cache, tk, pos = server._decode(
            server.params, cache, server._put(server.tokens),
            server._put(server.positions), jax.random.PRNGKey(i + 1),
        )
        np.asarray(toks)
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[1]
    print(f"RESULT {mode}: {t / K * 1e3:.2f} ms/step (window {WINDOW})",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "baseline")
