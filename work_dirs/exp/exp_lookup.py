"""Lookup kernel tuning sweep on the real chip.

Times the full flagship tokenize pipeline (the headline number) for each
candidate block config plus the XLA path — end-to-end is the only number
that matters and a 6-link chain through the tunnel is ~150ms of signal,
enough to rank configs.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import build, CHAIN_SHORT, CHAIN_LONG  # noqa: E402
from vector_quantization_tpu.ops import nearest_codes_xla  # noqa: E402
from vector_quantization_tpu.ops.vq_lookup import _nearest_codes_pallas  # noqa: E402


def tokenize_chain(model, lookup_fn, chain):
    def encode_once(params, x):
        feat = model.apply({"params": params}, x, method=model.encode)
        b, h, w, d = feat.shape
        flat = feat.reshape(b * h * w, d).astype(jnp.bfloat16)
        codebook = params["quantizer"]["codebook"].astype(jnp.bfloat16)
        return lookup_fn(flat, codebook).reshape(b, h, w)

    @jax.jit
    def chained(params, x, salt):
        def body(i, carry):
            x, acc = carry
            codes = encode_once(params, x)
            x = x * (1.0 + (codes[0, 0, 0] % 3).astype(x.dtype) * 1e-7)
            return (x, acc + codes.sum())

        _, acc = jax.lax.fori_loop(
            0, chain, body, (x * (1.0 + salt * 1e-7), jnp.zeros((), jnp.int32))
        )
        return acc

    return chained


def run(fn, params, x):
    float(fn(params, x, jnp.float32(0)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(fn(params, x, jnp.float32(i + 1)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]  # median: min can catch deduped fast returns


def images_per_sec(model, params, x, lookup_fn):
    t_s = run(tokenize_chain(model, lookup_fn, CHAIN_SHORT), params, x)
    t_l = run(tokenize_chain(model, lookup_fn, CHAIN_LONG), params, x)
    per_link = max(t_l - t_s, 1e-9) / (CHAIN_LONG - CHAIN_SHORT)
    return x.shape[0] / per_link


def run_shape(tag, model, params, x, configs):
    print(f"== {tag}", flush=True)
    for name, kw in configs:
        if kw is None:
            fn = nearest_codes_xla
        else:
            def fn(flat, cb, kw=kw):
                return _nearest_codes_pallas(flat, cb, **kw)
        try:
            ips = images_per_sec(model, params, x, fn)
            print(f"{name:18s} {ips:8.1f} img/s", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:18s} FAIL {type(exc).__name__}: {exc}"[:140], flush=True)


def main():
    model, params, x = build()
    run_shape("flagship f16 8192x256", model, params, x, [
        ("xla", None),
        ("pl_n512_kauto", dict(block_n=512)),
        ("pl_n1024_k4096", dict(block_n=1024, block_k=4096)),
        ("pl_n512_k2048", dict(block_n=512, block_k=2048)),
    ])
    model8, params8, x8 = build(
        batch=16, img=256, codebook=16384, dim=64,
        width=64, width_mults=(1, 1, 2, 2), normalize=True,
    )
    run_shape("f8 16384x64", model8, params8, x8, [
        ("xla", None),
        ("pl_n512_kauto", dict(block_n=512)),
        ("pl_n1024_kauto", dict(block_n=1024)),
    ])


if __name__ == "__main__":
    main()
