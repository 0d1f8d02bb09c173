"""AR decode throughput benchmark (tokens/s/chip).

The reference's second hot loop: incremental AR generation of image tokens
(SURVEY §3.3 — one HF forward per token, 256 steps/image at 256px f16).
Here generation is one jitted ``lax.scan`` over a static KV cache
(tasks/sequence_modeling.py:generate); this tool measures its steady-state
decode rate on the current backend for the Llama-medium C2I configuration
(24L/16H/1024d/2816ffn, vocab = 1000 classes + CFG + 16384 codes), in
bf16 and INT8 weight-only (Pallas kernel) variants.

Timing: the TPU tunnel pipelines dispatches, so each measurement fetches the
generated tokens (a true barrier) and reports the differential
(t(N_long) − t(N_short)) / (N_long − N_short) per-token time, cancelling
prefill and RPC latency.

Usage: python tools/bench_ar.py [--batch 8] [--layers 24] [--no-int8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vector_quantization_tpu.models.transformers.llama import (
    LlamaTransformer,
    quantize_params_int8,
)
from vector_quantization_tpu.tasks.sequence_modeling import (
    TokenCodebook,
    generate,
)

N_SHORT, N_LONG = 64, 256
NUM_CATEGORIES, CODEBOOK = 1000, 16384


def build(layers: int, dtype) -> tuple[LlamaTransformer, dict]:
    transformer = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + CODEBOOK,
        hidden_size=1024,
        num_layers=layers,
        num_heads=16,
        ffn_dim=2816,
        max_length=1 + N_LONG,
        dtype=dtype,
    )
    params = transformer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32)
    )["params"]
    return transformer, params


def time_generate(transformer, params, batch: int, num_tokens: int) -> float:
    codebook = TokenCodebook(NUM_CATEGORIES + 1, CODEBOOK)
    prefix = jnp.zeros((batch, 1), jnp.int32)

    # params/prefix as jit ARGUMENTS (closing over them would bake ~350MB of
    # weights into the jaxpr as constants and stall compilation)
    def run(params, prefix, key):
        return generate(
            transformer, params, prefix, num_tokens, codebook, key,
            sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
        )

    fn = jax.jit(run)
    np.asarray(fn(params, prefix, jax.random.PRNGKey(1)))  # compile + warmup
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(params, prefix, jax.random.PRNGKey(2 + i)))
        best = min(best, time.perf_counter() - t0)
    return best


def tokens_per_sec(transformer, params, batch: int) -> float:
    t_short = time_generate(transformer, params, batch, N_SHORT)
    t_long = time_generate(transformer, params, batch, N_LONG)
    per_tok = max(t_long - t_short, 1e-9) / (N_LONG - N_SHORT)
    return batch / per_tok


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--layers", type=int, default=24)
    parser.add_argument("--no-int8", action="store_true")
    args = parser.parse_args()

    transformer, params = build(args.layers, jnp.bfloat16)
    bf16 = tokens_per_sec(transformer, params, args.batch)
    result = {
        "metric": (
            f"AR decode tokens/s/chip (Llama-medium {args.layers}L/1024d, "
            f"batch {args.batch})"
        ),
        "bf16_tokens_per_s": round(bf16, 1),
        "images_per_s_at_256px_f16": round(bf16 / 256, 2),
    }
    if not args.no_int8:
        tr_q = LlamaTransformer(
            vocabulary_size=NUM_CATEGORIES + 1 + CODEBOOK,
            hidden_size=1024,
            num_layers=args.layers,
            num_heads=16,
            ffn_dim=2816,
            max_length=1 + N_LONG,
            dtype=jnp.bfloat16,
            quantize=True,
        )
        q_params = quantize_params_int8(params)
        result["int8_tokens_per_s"] = round(
            tokens_per_sec(tr_q, q_params, args.batch), 1
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
