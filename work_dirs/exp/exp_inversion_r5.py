"""r5: why does int8w LOSE raw batch decode but WIN serving? (r4 weak #3)

Four timed configs, all b64, int8 KV, 256 steps:
  gen_bf16w / gen_int8w       — generate()'s kv_segment scan (unfused qkv)
  srv_bf16w / srv_int8w       — the serving engine's aligned scan
                                (fused qkv, windowed cache, CFG sampling)
If the int8w/bf16w ranking flips between the two forms, the per-form
deltas say which ingredient (fused qkv, window shape, sampler) moves it.
"""

import json
import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp

import bench
from vector_quantization_tpu.tasks import serving as srv_mod


def main():
    overhead = bench._rpc_overhead()
    _, fp = bench._ar_build(False)
    out = {}
    for name, kw in (
        ("gen_bf16w", dict(quantize=False)),
        ("gen_int8w", dict(quantize=True)),
    ):
        t, _ = bench.ar_tokens_per_sec(
            batch=bench.AR_SERVE_BATCH, overhead=overhead,
            params=fp, cache_dtype=jnp.int8, **kw,
        )
        out[name] = round(t, 1)
        print(json.dumps({name: out[name]}), flush=True)
    for name, q in (("srv_bf16w", False), ("srv_int8w", True)):
        try:
            srv = bench.serving_tokens_per_sec(
                fp, overhead, quantize=q, cache_dtype=jnp.int8,
            )
            out[name] = srv["tokens_per_s"]
        except Exception as exc:
            out[name] = f"{type(exc).__name__}: {exc}"[:200]
        print(json.dumps({name: out[name]}), flush=True)
    if all(isinstance(out.get(k), float) for k in
           ("gen_bf16w", "gen_int8w", "srv_bf16w", "srv_int8w")):
        print(json.dumps({
            "gen_int8w_vs_bf16w": round(out["gen_int8w"] / out["gen_bf16w"], 3),
            "srv_int8w_vs_bf16w": round(out["srv_int8w"] / out["srv_bf16w"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
