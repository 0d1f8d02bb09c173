"""Continuous-batching AR serving throughput (effective tokens/s/chip).

Measures the ARServer end-to-end serving rate — the number VERDICT r1
flagged as never recorded: submit R class-conditional requests, run the
slot loop to completion, report generated-image tokens/s (counting only
tokens that end up in delivered images; CFG decodes two lanes per request
but the pair produces one token stream) and images/min.

Exercises the production configuration: CFG α=1.75, top-k 600 / top-p
0.92, ``steps_per_sync`` device-side multi-step decode, optional INT8.

Usage: python tools/bench_serving.py [--requests 32] [--slots 16]
       [--steps-per-sync 16] [--layers 24] [--int8] [--no-cfg] [--tiny]
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

from vector_quantization_tpu.cli.common import honor_env_platform  # noqa: E402

honor_env_platform()


from vector_quantization_tpu.models.transformers.llama import (  # noqa: E402
    LlamaTransformer,
    quantize_params_int8,
)
from vector_quantization_tpu.tasks.sequence_modeling import (  # noqa: E402
    TokenCodebook,
)
from vector_quantization_tpu.tasks.serving import ARServer  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--steps-per-sync", type=int, default=16)
    p.add_argument("--image-tokens", type=int, default=256)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--no-cfg", action="store_true")
    p.add_argument("--paged", action="store_true",
                   help="page-pooled KV cache (ops/paged_kv.py)")
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--num-pages", type=int, default=None)
    p.add_argument(
        "--tiny", action="store_true",
        help="tiny model smoke (CPU-runnable validation)",
    )
    args = p.parse_args()

    num_categories, codebook_size = 1000, 16384
    if args.tiny:
        num_categories, codebook_size = 10, 32
        dims = dict(hidden_size=32, num_layers=2, num_heads=2, ffn_dim=64)
        args.image_tokens = min(args.image_tokens, 16)
    else:
        dims = dict(
            hidden_size=1024, num_layers=args.layers, num_heads=16,
            ffn_dim=2816,
        )
    cfg_alpha = None if args.no_cfg else 1.75
    tr = LlamaTransformer(
        vocabulary_size=num_categories + 1 + codebook_size,
        max_length=1 + args.image_tokens + args.steps_per_sync,
        dtype=jnp.bfloat16,
        quantize=args.int8,
        **dims,
    )
    params = tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    if args.int8:
        params = quantize_params_int8(params)
    cb = TokenCodebook(num_categories + 1, codebook_size)

    def serve(n_requests: int) -> float:
        server = ARServer(
            tr, params, cb,
            image_tokens=args.image_tokens,
            batch_slots=args.slots,
            sampler={"temperature": 1.0, "top_k": 600, "top_p": 0.92},
            cfg_alpha=cfg_alpha,
            uncond_token=None if args.no_cfg else num_categories,
            steps_per_sync=args.steps_per_sync,
            paged=args.paged,
            page_size=args.page_size,
            num_pages=args.num_pages,
        )
        for i in range(n_requests):
            server.submit(category=i % num_categories)
        t0 = time.perf_counter()
        done = server.run_until_drained()
        dt = time.perf_counter() - t0
        assert len(done) == n_requests, (len(done), n_requests)
        return dt

    serve(max(2, args.slots // (1 if args.no_cfg else 2)))  # warmup+compile
    dt = serve(args.requests)
    tokens = args.requests * args.image_tokens
    print(
        json.dumps(
            {
                "metric": (
                    "AR serving tokens/s/chip (continuous batching, "
                    f"{'CFG a=1.75' if cfg_alpha else 'no CFG'}, "
                    f"{args.slots} slots, steps_per_sync="
                    f"{args.steps_per_sync}"
                    f"{', paged' if args.paged else ''}"
                    f"{', INT8' if args.int8 else ''})"
                ),
                "tokens_per_s": round(tokens / dt, 1),
                "images_per_min": round(args.requests / dt * 60.0, 1),
                "requests": args.requests,
                "image_tokens": args.image_tokens,
            }
        )
    )


if __name__ == "__main__":
    main()
