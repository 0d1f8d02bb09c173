"""Headline benchmark: images tokenized/sec/chip.

VQGAN-f16 tokenizer encode path (conv encoder → Pallas nearest-codebook
lookup) on 256×256 images, 8192×256 codebook, bf16 compute — the reference's
corpus-tokenization hot path (SURVEY §3.4; BASELINE.json metric
"images tokenized/sec/chip"). ``vs_baseline`` = speedup over the identical
pipeline with the reference's lookup algorithm (XLA cdist + argmin) on the
same hardware.

Timing methodology (the TPU tunnel pipelines/dedups dispatches and
``block_until_ready`` is unreliable through it): each measurement jits a
dependent chain of N tokenize passes reduced to one scalar, fetches the
scalar (a true barrier), and reports the differential time
(t(N_long) − t(N_short)) / (N_long − N_short), cancelling RPC latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from vector_quantization_tpu import algorithms  # noqa: F401
from vector_quantization_tpu.ops import nearest_codes_xla
from vector_quantization_tpu.ops.vq_lookup import _nearest_codes_pallas
from vector_quantization_tpu.registries import ModelRegistry

BATCH = 32
IMG = 256
CODEBOOK = 8192
DIM = 256
CHAIN_SHORT, CHAIN_LONG = 2, 6


def build():
    model = ModelRegistry.build(
        {
            "type": "TokenizerModel",
            "encoder": {
                "type": "VQGANEncoder",
                "width": 128,
                "out_channels": DIM,
                "dtype": jnp.bfloat16,
            },
            "quantizer": {
                "type": "VectorQuantizer",
                "codebook_size": CODEBOOK,
                "embedding_dim": DIM,
            },
        }
    )
    x = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables["params"], x


def tokenize_chain(model, use_pallas: bool, chain: int):
    def encode_once(params, x):
        feat = model.apply({"params": params}, x, method=model.encode)
        b, h, w, d = feat.shape
        flat = feat.reshape(b * h * w, d).astype(jnp.bfloat16)
        codebook = params["quantizer"]["codebook"].astype(jnp.bfloat16)
        if use_pallas:
            codes = _nearest_codes_pallas(flat, codebook)
        else:
            codes = nearest_codes_xla(flat, codebook)
        return codes.reshape(b, h, w)

    @jax.jit
    def chained(params, x):
        def body(i, carry):
            x, acc = carry
            codes = encode_once(params, x)
            # dependent perturbation: each link must execute before the next
            x = x * (1.0 + (codes[0, 0, 0] % 3).astype(x.dtype) * 1e-7)
            return (x, acc + codes.sum())

        _, acc = jax.lax.fori_loop(
            0, chain, body, (x, jnp.zeros((), jnp.int32))
        )
        return acc

    return chained


def _run(fn, params, x) -> float:
    float(fn(params, x))  # warmup (compile + execute)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(params, x))  # scalar fetch = true barrier
        best = min(best, time.perf_counter() - t0)
    return best


def images_per_sec(model, params, x, use_pallas: bool) -> float:
    t_short = _run(tokenize_chain(model, use_pallas, CHAIN_SHORT), params, x)
    t_long = _run(tokenize_chain(model, use_pallas, CHAIN_LONG), params, x)
    per_link = max(t_long - t_short, 1e-9) / (CHAIN_LONG - CHAIN_SHORT)
    return BATCH / per_link


def main() -> None:
    model, params, x = build()
    ips_pallas = images_per_sec(model, params, x, use_pallas=True)
    ips_xla = images_per_sec(model, params, x, use_pallas=False)
    print(
        json.dumps(
            {
                "metric": "images tokenized/sec/chip (VQGAN-f16 256px, 8192x256 codebook)",
                "value": round(ips_pallas, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(ips_pallas / ips_xla, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
