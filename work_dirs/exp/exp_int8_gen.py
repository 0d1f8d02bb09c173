"""Full-generate INT8 strategy comparison at the serving batch (b64).

The only robust signal through the tunnel is a seconds-long program: one
generate() of 256 tokens at b64 is 1.5-65s depending on strategy.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vector_quantization_tpu.models.transformers.llama import (
    LlamaTransformer,
    quantize_params_int8,
)
from vector_quantization_tpu.tasks.sequence_modeling import TokenCodebook, generate

NUM_CATEGORIES, AR_CODEBOOK = 1000, 16384
AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)
B, N_TOK = 64, 256


def build(quantize, mode, fp_params):
    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=1 + N_TOK,
        dtype=jnp.bfloat16,
        quantize=quantize,
        quantize_mode=mode,
        **AR_CFG,
    )
    params = quantize_params_int8(fp_params) if quantize else fp_params
    return tr, params


def rpc_overhead():
    fn = jax.jit(lambda x: x + 1)
    x = jnp.zeros((), jnp.float32)
    float(fn(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


def time_generate(tr, params, overhead):
    codebook = TokenCodebook(NUM_CATEGORIES + 1, AR_CODEBOOK)
    prefix = jnp.zeros((B, 1), jnp.int32)

    def run(params, prefix, key):
        return generate(
            tr, params, prefix, N_TOK, codebook, key,
            sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
        )

    fn = jax.jit(run)
    t0 = time.perf_counter()
    np.asarray(fn(params, prefix, jax.random.PRNGKey(1)))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(params, prefix, jax.random.PRNGKey(2 + i)))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2]
    return max(t - overhead, 1e-9)


def main():
    modes = sys.argv[1:] or ["bf16", "pallas", "xla", "w8a8"]
    key = jax.random.PRNGKey(0)
    tr0 = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=1 + N_TOK,
        dtype=jnp.bfloat16,
        **AR_CFG,
    )
    fp_params = tr0.init(key, jnp.zeros((1, 4), jnp.int32))["params"]
    overhead = rpc_overhead()
    print(f"rpc overhead {overhead*1e3:.1f}ms", flush=True)
    for mode in modes:
        quantize = mode != "bf16"
        tr, params = build(quantize, mode if quantize else "auto", fp_params)
        print(f"mode={mode}:", flush=True)
        t = time_generate(tr, params, overhead)
        print(
            f"  {t*1e3:.0f}ms total, {B*N_TOK/t:.0f} tok/s, "
            f"{t/N_TOK*1e3:.2f}ms/step",
            flush=True,
        )


if __name__ == "__main__":
    main()
