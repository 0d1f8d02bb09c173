"""Decompose the serving decode step cost (fresh process per config).

Usage: python work_dirs/exp/exp_decode_prof.py CONFIG
Configs: dense_bf16 dense_int8kv dense_short dense_nocfg dense_argmax
         paged_bf16_kernel paged_int8_kernel paged_bf16_gather
         generate_ref generate_full

Times ONLY the jitted k-step decode scan (server._decode) on a full
active batch — no host bookkeeping, no drain tail — so configs are
comparable and the step cost decomposes by ablation.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vector_quantization_tpu.models.transformers.llama import (
    LlamaTransformer,
    fuse_llama_params,
)
from vector_quantization_tpu.tasks.sequence_modeling import TokenCodebook
from vector_quantization_tpu.tasks.serving import ARServer

NUM_CATEGORIES, AR_CODEBOOK = 1000, 16384
AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)
K = 64


def main(config: str):
    image_tokens = 64 if config == "dense_short" else 256
    cfg_alpha = None if config in ("dense_nocfg", "dense_argmax") else 1.75
    sampler = (
        {"temperature": 1e-4}
        if config == "dense_argmax"
        else {"temperature": 1.0, "top_k": 600, "top_p": 0.92}
    )
    cache_dtype = jnp.int8 if "int8" in config else jnp.bfloat16
    paged = config.startswith("paged")
    paged_kernel = None if "kernel" in config else False if paged else None

    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=1 + image_tokens + K,
        dtype=jnp.bfloat16,
        fused_qkv=True,
        paged_kernel=paged_kernel,
        **AR_CFG,
    )
    params = tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    params = fuse_llama_params(params)
    cb = TokenCodebook(NUM_CATEGORIES + 1, AR_CODEBOOK)

    if config.startswith("generate"):
        from vector_quantization_tpu.tasks.sequence_modeling import generate

        seg = None if config == "generate_full" else 32
        prefix = jnp.zeros((64, 1), jnp.int32)

        def run(params, prefix, key):
            return generate(
                tr, params, prefix, 256, cb, key,
                sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
                kv_segment=seg,
            )

        fn = jax.jit(run)
        np.asarray(fn(params, prefix, jax.random.PRNGKey(1)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(params, prefix, jax.random.PRNGKey(2 + i)))
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[1]
        print(
            f"RESULT {config}: {64 * 256 / t:.0f} rows/s "
            f"({t / 256 * 1e3:.2f} ms/step-row64)",
            flush=True,
        )
        return

    server = ARServer(
        tr, params, cb,
        image_tokens=image_tokens,
        batch_slots=64,
        sampler=sampler,
        cfg_alpha=cfg_alpha,
        uncond_token=NUM_CATEGORIES if cfg_alpha else None,
        steps_per_sync=K,
        paged=paged,
        page_size=64,
        cache_dtype=cache_dtype,
    )
    # activate every slot at a mid-flight position so the scan is fully
    # representative (all rows live, positions ~128)
    for i in range(server.num_requests_slots):
        server.submit(category=i % NUM_CATEGORIES)
    server._fill_slots()
    server.positions[:] = 128
    server.tokens[:] = cb.start + 5
    if paged:
        server._allocate_pages()
        p_cap = server.pages_per_slot
        cache_in = server.cache._replace(
            page_table=server._put(server._page_table[:, :p_cap])
        )
    else:
        cache_in = server.cache

    toks, cache_out, tk, pos = server._decode(
        server.params, cache_in,
        server._put(server.tokens), server._put(server.positions),
        jax.random.PRNGKey(0),
    )
    np.asarray(toks)
    ts = []
    for i in range(5):
        # positions re-fed at 128 each call; cache_out donated back in
        t0 = time.perf_counter()
        toks, cache_out, tk, pos = server._decode(
            server.params, cache_out,
            server._put(server.tokens), server._put(server.positions),
            jax.random.PRNGKey(i + 1),
        )
        np.asarray(toks)
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2]
    rows = 64 * K
    print(
        f"RESULT {config}: {rows / t:.0f} rows/s  ({t / K * 1e3:.2f} ms/step)"
        f"  spread {(sorted(ts)[-1] - sorted(ts)[0]) / t:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main(sys.argv[1])
