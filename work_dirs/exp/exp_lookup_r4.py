"""Round-4 f8 lookup dispatch evidence (VERDICT r3 #4).

Three consecutive recorded runs show the Pallas kernel LOSING at its own
dispatch-chosen D=64 shape (BENCH_r03 0.99, judge 0.971, r4 smoke 0.985).
Sweep kernel block shapes at the f8 end-to-end shape with interleaved
trials; if no config beats XLA by >= noise, flip `_default_use_pallas` to
XLA everywhere.

Run: python work_dirs/exp/exp_lookup_r4.py
"""

import json
import time

import jax
import jax.numpy as jnp

from vector_quantization_tpu.ops.vq_lookup import (
    _nearest_codes_pallas,
    nearest_codes_xla,
)

# the f8 microshape: encoder emits 16*32*32 rows of D=64 against 16384 codes
import os
N = int(os.environ.get("LK_N", 16 * 32 * 32))
K = int(os.environ.get("LK_K", 16384))
D = int(os.environ.get("LK_D", 64))
CHAIN = 96
TRIALS = 5


def chained(fn):
    @jax.jit
    def run(x, e, salt):
        def body(i, carry):
            x, acc = carry
            codes = fn(x.astype(jnp.bfloat16), e)
            x = x * (1.0 + (codes[0] % 3).astype(jnp.float32) * 1e-7)
            return (x, acc + codes.sum())

        _, acc = jax.lax.fori_loop(
            0, CHAIN, body, (x * (1.0 + salt * 1e-9), jnp.zeros((), jnp.int32))
        )
        return acc

    return run


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    e = jax.random.normal(jax.random.PRNGKey(1), (K, D), jnp.bfloat16)

    variants = {"xla": chained(nearest_codes_xla)}
    for bn in (256, 512, 1024, 2048):
        for bk in (1024, 2048, 4096, None):
            name = f"pallas_n{bn}_k{bk}"
            variants[name] = chained(
                lambda x_, e_, bn=bn, bk=bk: _nearest_codes_pallas(
                    x_, e_, block_n=bn, block_k=bk
                )
            )

    ts = {name: [] for name in variants}
    ok = {}
    for name, fn in variants.items():
        try:
            float(fn(x, e, jnp.float32(0)))
            ok[name] = fn
        except Exception as exc:
            print(f"{name}: compile fail {type(exc).__name__}", flush=True)
    for i in range(TRIALS):
        for name, fn in ok.items():
            t0 = time.perf_counter()
            float(fn(x, e, jnp.float32(i + 1)))
            ts[name].append(time.perf_counter() - t0)

    meds = {
        name: sorted(v)[TRIALS // 2] for name, v in ts.items() if v
    }
    base = meds["xla"]
    out = {
        name: {
            "ms_chain": round(t * 1e3, 1),
            "vs_xla": round(base / t, 3),
            "spread": round(
                (sorted(ts[name])[-1] - sorted(ts[name])[0]) / t, 3
            ),
        }
        for name, t in sorted(meds.items(), key=lambda kv: kv[1])
    }
    print("RESULT", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
