"""Round-4 serving matrix: dense vs paged slot cache, bf16 vs int8 KV.

Finding from the first probe: serving at k=64 has ZERO overshoot
(256 % 64 == 0) and ~1% host share — the 46% gap to raw decode is in the
device step: the paged path (Pallas VPU kernel or gather) costs ~7.2ms
per 64-row step vs the dense cache's ~3.7ms in generate(). The paged
pool buys allocation granularity that doesn't matter at 64 slots x 321
rows (~2 GB bf16), so measure the dense slot cache (which reads the
full window via one XLA einsum, no gather materialisation, and already
supports int8 KV) as a serving mode.

Run: python work_dirs/exp/exp_serving2_r4.py
"""

import json
import time

import jax
import jax.numpy as jnp

from vector_quantization_tpu.models.transformers.llama import (
    LlamaTransformer,
    fuse_llama_params,
    quantize_params_int8,
)
from vector_quantization_tpu.tasks.sequence_modeling import TokenCodebook
from vector_quantization_tpu.tasks.serving import ARServer

NUM_CATEGORIES, AR_CODEBOOK = 1000, 16384
AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)
IMAGE_TOKENS, SLOTS = 256, 64


def build_params():
    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=8,
        dtype=jnp.bfloat16,
        **AR_CFG,
    )
    return tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]


def run_one(fp_params, *, cache_dtype, k, paged, paged_kernel=None,
            quantize=False, requests=64):
    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=1 + IMAGE_TOKENS + k,
        dtype=jnp.bfloat16,
        quantize=quantize,
        fused_qkv=True,
        paged_kernel=paged_kernel,
        **AR_CFG,
    )
    params = quantize_params_int8(fp_params) if quantize else fp_params
    params = fuse_llama_params(params)
    cb = TokenCodebook(NUM_CATEGORIES + 1, AR_CODEBOOK)
    server = ARServer(
        tr, params, cb,
        image_tokens=IMAGE_TOKENS,
        batch_slots=SLOTS,
        sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
        cfg_alpha=1.75,
        uncond_token=NUM_CATEGORIES,
        steps_per_sync=k,
        paged=paged,
        page_size=64,
        cache_dtype=cache_dtype,
    )

    def serve(n):
        for i in range(n):
            server.submit(category=i % NUM_CATEGORIES)
        t0 = time.perf_counter()
        done = server.run_until_drained()
        dt = time.perf_counter() - t0
        assert len(done) == n
        return dt

    serve(SLOTS // 2)
    for key in server.stats:
        server.stats[key] = 0 if isinstance(server.stats[key], int) else 0.0
    dt = serve(requests)
    eff = requests * IMAGE_TOKENS / dt
    rep = server.efficiency_report()
    return round(eff, 1), rep


def main():
    fp = build_params()
    configs = [
        ("dense_bf16_k64", dict(cache_dtype=jnp.bfloat16, k=64, paged=False)),
        ("dense_int8kv_k64", dict(cache_dtype=jnp.int8, k=64, paged=False)),
        ("dense_int8kv_k128", dict(cache_dtype=jnp.int8, k=128, paged=False)),
        (
            "dense_int8w_int8kv_k64",
            dict(cache_dtype=jnp.int8, k=64, paged=False, quantize=True),
        ),
        (
            "dense_int8w_int8kv_k128",
            dict(cache_dtype=jnp.int8, k=128, paged=False, quantize=True),
        ),
        (
            "dense_int8w_bf16kv_k64",
            dict(cache_dtype=jnp.bfloat16, k=64, paged=False, quantize=True),
        ),
    ]
    out = {}
    for tag, kw in configs:
        t0 = time.perf_counter()
        try:
            eff, rep = run_one(fp, **kw)
            out[tag] = {
                "eff_tok_s": eff,
                "device_frac": round(
                    rep["device_s"] / (rep["device_s"] + rep["host_s"]), 3
                ),
                "idle": rep.get("idle_lane_frac"),
                "overshoot": rep.get("overshoot_frac"),
                "wall_incl_compile_s": round(time.perf_counter() - t0, 1),
            }
        except Exception as exc:
            out[tag] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
        print(tag, json.dumps(out[tag]), flush=True)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
