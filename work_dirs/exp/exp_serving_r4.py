"""Round-4 serving sweep: compose int8-KV with paged serving and kill the
overshoot waste.

Hypothesis from VERDICT r3 #3 + slot arithmetic: a 257-position request
(class token + 256 image tokens) under steps_per_sync=64 costs
ceil(257/64)*64 = 320 decoded positions per stream -> 24.5% overshoot.
k=86 -> 258 (3 syncs), k=129 -> 258 (2 syncs): ~0.4% overshoot and fewer
host round trips. Sweep {k} x {bf16, int8kv, int8w+int8kv}.

Run: python work_dirs/exp/exp_serving_r4.py [--quick]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vector_quantization_tpu.models.transformers.llama import (
    LlamaTransformer,
    fuse_llama_params,
    quantize_params_int8,
)
from vector_quantization_tpu.tasks.sequence_modeling import TokenCodebook
from vector_quantization_tpu.tasks.serving import ARServer

NUM_CATEGORIES, AR_CODEBOOK = 1000, 16384
AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)
IMAGE_TOKENS = 256
SLOTS = 64


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


def run_one(fp_params, *, quantize, cache_dtype, steps_per_sync, page_size,
            requests=64):
    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=1 + IMAGE_TOKENS + steps_per_sync,
        dtype=jnp.bfloat16,
        quantize=quantize,
        fused_qkv=True,
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
        steps_per_sync=steps_per_sync,
        paged=True,
        page_size=page_size,
        cache_dtype=cache_dtype,
    )

    def serve(n):
        for i in range(n):
            server.submit(category=i % NUM_CATEGORIES)
        t0 = time.perf_counter()
        done = server.run_until_drained()
        dt = time.perf_counter() - t0
        assert len(done) == n, (len(done), n)
        return dt

    serve(SLOTS // 2)  # warmup/compile
    for key in server.stats:
        server.stats[key] = 0 if isinstance(server.stats[key], int) else 0.0
    dt = serve(requests)
    eff = requests * IMAGE_TOKENS / dt
    rep = server.efficiency_report()
    return eff, rep


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--requests", type=int, default=64)
    args = p.parse_args()

    fp = build_params()
    ks = [64, 129] if args.quick else [64, 86, 129]
    modes = [
        ("bf16", dict(quantize=False, cache_dtype=jnp.bfloat16)),
        ("int8kv", dict(quantize=False, cache_dtype=jnp.int8)),
    ]
    if not args.quick:
        modes.append(("int8w_int8kv", dict(quantize=True, cache_dtype=jnp.int8)))
    out = {}
    for mode, mkw in modes:
        for k in ks:
            tag = f"{mode}_k{k}"
            t0 = time.perf_counter()
            eff, rep = run_one(
                fp, steps_per_sync=k, page_size=64,
                requests=args.requests, **mkw,
            )
            out[tag] = {
                "eff_tok_s": round(eff, 1),
                "img_per_min": round(eff / IMAGE_TOKENS * 60, 1),
                "wall_incl_compile_s": round(time.perf_counter() - t0, 1),
                **rep,
            }
            print(tag, json.dumps(out[tag]), flush=True)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
