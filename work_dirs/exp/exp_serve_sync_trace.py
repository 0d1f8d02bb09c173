"""Per-sync trace of one serving run: where does each sync's wall go?

Usage: python work_dirs/exp/exp_serve_sync_trace.py [bf16|int8kv|int8w_int8kv] [k]
"""

import sys
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


def main(mode: str, k: int):
    quantize = mode.startswith("int8w")
    cache_dtype = jnp.int8 if "int8kv" in mode else jnp.bfloat16
    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=256 + k,
        dtype=jnp.bfloat16,
        quantize=quantize,
        fused_qkv=True,
        **AR_CFG,
    )
    params = tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    if quantize:
        params = quantize_params_int8(params)
    params = fuse_llama_params(params)
    cb = TokenCodebook(NUM_CATEGORIES + 1, AR_CODEBOOK)
    server = ARServer(
        tr, params, cb,
        image_tokens=256,
        batch_slots=64,
        sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
        cfg_alpha=1.75,
        uncond_token=NUM_CATEGORIES,
        steps_per_sync=k,
        cache_dtype=cache_dtype,
    )

    def serve(n, label):
        for i in range(n):
            server.submit(category=i % NUM_CATEGORIES)
        t0 = time.perf_counter()
        syncs = 0
        while server.pending:
            s0 = time.perf_counter()
            d0 = server.stats["device_s"]
            server.step()
            s1 = time.perf_counter()
            syncs += 1
            if label == "timed":
                print(
                    f"sync {syncs}: wall {(s1 - s0) * 1e3:.0f} ms, device "
                    f"{(server.stats['device_s'] - d0) * 1e3:.0f} ms, "
                    f"window {server.cache.window}",
                    flush=True,
                )
        dt = time.perf_counter() - t0
        return dt

    serve(32, "warmup")
    dt = serve(64, "timed")
    print(
        f"RESULT {mode}_k{k}: {64 * 256 / dt:.0f} eff tok/s "
        f"({64 * 256 / dt / 256 * 60:.0f} img/min)",
        flush=True,
    )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "int8kv",
        int(sys.argv[2]) if len(sys.argv) > 2 else 64,
    )
