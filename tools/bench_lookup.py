"""Pallas nearest-codebook kernel microbench (TFLOP/s vs the XLA lookup).

Validates the kernel's speed-of-light claim with a *recorded* number
instead of README prose: times ``_nearest_codes_pallas`` against
``nearest_codes_xla`` at configurable (N tokens, K codes, D dims) shapes and
reports effective TFLOP/s (2·N·K·D FLOPs for the distance matmul) and the
fraction of the chip's bf16 peak.

Timing uses the same dependent-chain differential method as bench.py
(the TPU tunnel pipelines dispatches; a scalar fetch is the only reliable
barrier).

Usage: python tools/bench_lookup.py [--n 16384] [--k 16384] [--d 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import chip_specs  # noqa: E402
from vector_quantization_tpu.ops import nearest_codes_xla  # noqa: E402
from vector_quantization_tpu.ops.vq_lookup import (  # noqa: E402
    _nearest_codes_pallas,
)

CHAIN_SHORT, CHAIN_LONG = 2, 8


def lookup_chain(fn, n, k, d, chain):
    # f32 carrier — a bf16 carrier rounds the 1+k*1e-7 multiplier to exactly
    # 1.0, XLA then proves the body loop-invariant and hoists the lookup out
    # of the chain (measured: "impossible" TFLOP/s). The f32 multiplier is
    # representable, so every link really executes.
    @jax.jit
    def chained(x, e):
        def body(i, carry):
            x, acc = carry
            codes = fn(x.astype(jnp.bfloat16), e)
            x = x * (1.0 + (codes[0] % 3).astype(jnp.float32) * 1e-7)
            return (x, acc + codes.sum())

        _, acc = jax.lax.fori_loop(
            0, chain, body, (x, jnp.zeros((), jnp.int32))
        )
        return acc

    return chained


def time_lookup(fn, n, k, d) -> float:
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    e = jax.random.normal(jax.random.PRNGKey(1), (k, d), jnp.bfloat16)

    def best_of(chain):
        chained = lookup_chain(fn, n, k, d, chain)
        float(chained(x, e))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x, e))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short, t_long = best_of(CHAIN_SHORT), best_of(CHAIN_LONG)
    return max(t_long - t_short, 1e-9) / (CHAIN_LONG - CHAIN_SHORT)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=16384)
    p.add_argument("--k", type=int, default=16384)
    p.add_argument("--d", type=int, default=256)
    args = p.parse_args()

    peak, _ = chip_specs()
    flops = 2.0 * args.n * args.k * args.d
    t_pallas = time_lookup(_nearest_codes_pallas, args.n, args.k, args.d)
    t_xla = time_lookup(
        lambda x, e: nearest_codes_xla(x, e), args.n, args.k, args.d
    )
    print(
        json.dumps(
            {
                "shape": f"{args.n}x{args.k}x{args.d}",
                "pallas_tflops": round(flops / t_pallas / 1e12, 1),
                "pallas_frac_of_peak": round(flops / t_pallas / peak, 3),
                "xla_tflops": round(flops / t_xla / 1e12, 1),
                "speedup": round(t_xla / t_pallas, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
