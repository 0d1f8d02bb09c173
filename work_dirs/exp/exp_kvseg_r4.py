"""Round-4 kv_segment sweep (VERDICT r3 #7): cut remaining decode KV reads.

kv_segment=32 averages ~145 of 257 rows; 16 would average ~81, 8 ~49 —
but smaller segments mean more scans (compile variants) and more cache
regrow copies. Measure b64 bf16 + int8kv at each segment size.

Run: python work_dirs/exp/exp_kvseg_r4.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vector_quantization_tpu.models.transformers.llama import LlamaTransformer
from vector_quantization_tpu.tasks.sequence_modeling import (
    TokenCodebook,
    generate,
)

NUM_CATEGORIES, AR_CODEBOOK = 1000, 16384
AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)
BATCH, TOKENS = 64, 256


def main():
    tr = LlamaTransformer(
        vocabulary_size=NUM_CATEGORIES + 1 + AR_CODEBOOK,
        max_length=1 + TOKENS,
        dtype=jnp.bfloat16,
        **AR_CFG,
    )
    params = tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    cb = TokenCodebook(NUM_CATEGORIES + 1, AR_CODEBOOK)
    prefix = jnp.zeros((BATCH, 1), jnp.int32)

    out = {}
    for cache_dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8kv")):
        for seg in (8, 16, 32, 64, None):
            def run(params, prefix, key, seg=seg, cd=cache_dtype):
                return generate(
                    tr, params, prefix, TOKENS, cb, key,
                    sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
                    cache_dtype=cd, kv_segment=seg,
                )

            fn = jax.jit(run)
            np.asarray(fn(params, prefix, jax.random.PRNGKey(1)))
            ts = []
            for i in range(5):
                t0 = time.perf_counter()
                np.asarray(fn(params, prefix, jax.random.PRNGKey(2 + i)))
                ts.append(time.perf_counter() - t0)
            t = sorted(ts)[2]
            name = f"{tag}_seg{seg}"
            out[name] = {
                "tok_s": round(BATCH * TOKENS / t, 1),
                "spread": round((sorted(ts)[-1] - sorted(ts)[0]) / t, 3),
            }
            print(name, out[name], flush=True)
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
