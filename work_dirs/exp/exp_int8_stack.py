"""Localize the in-scan INT8 slowdown: 24-layer projection stack in a loop.

Mimics the decode scan's matmul load (24 x [4x(1024,1024) + 2x(1024,2816)
+ (2816,1024)] + head) without attention/sampling, 64-row activations,
256 loop steps. Variants isolate padding, strategy, and kernel.
"""
import sys
import time

import jax
import jax.numpy as jnp

from vector_quantization_tpu.ops.int8_matmul import (
    _int8_matmul_pallas,
    _int8_matmul_xla,
    int8_matmul_w8a8,
)

B = 64
LAYERS = 24
STEPS = 64  # loop steps (fewer than 256: signal is per-step anyway)
import os
D, FFN, V = 1024, 2816, int(os.environ.get('EXP_V', 17408))


def build_weights(key):
    ws = []
    for layer in range(LAYERS):
        shapes = [(D, D)] * 4 + [(D, FFN)] * 2 + [(FFN, D)]
        layer_ws = []
        for i, (d, f) in enumerate(shapes):
            key, k = jax.random.split(key)
            w = jax.random.normal(k, (d, f), jnp.float32) * 0.02
            layer_ws.append(w)
        ws.append(layer_ws)
    key, k = jax.random.split(key)
    head = jax.random.normal(k, (D, V), jnp.float32) * 0.02
    return ws, head


def quant(w):
    scale = jnp.maximum(jnp.abs(w).max(axis=0) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def run_loop(matmul, ws, head_w, tag):
    """matmul(x, w_entry) -> (B, f). Weights passed as args (closure
    constants embed GBs into the program and stall remote compile)."""

    @jax.jit
    def prog(x0, salt, ws, head_w):
        def body(i, carry):
            x, acc = carry
            h = x * (1.0 + salt * 1e-9)
            for layer_ws in ws:
                y = h
                q = 0.0
                for j, w in enumerate(layer_ws[:4]):
                    q = q + matmul(y, w)[:, :D]  # keep all 4 live (no DCE)
                h2 = q.astype(jnp.bfloat16)
                g = matmul(h2, layer_ws[4])[:, :FFN].astype(jnp.bfloat16)
                u = matmul(h2, layer_ws[5])[:, :FFN].astype(jnp.bfloat16)
                h = matmul(g * u, layer_ws[6])[:, :D].astype(jnp.bfloat16)
            logits = matmul(h, head_w)
            tok = jnp.argmax(logits[:, :V], axis=-1)
            x = x * (1.0 + (tok[0] % 3).astype(jnp.bfloat16) * 1e-7)
            return (x, acc + tok[0])

        _, acc = jax.lax.fori_loop(0, STEPS, body, (x0, jnp.zeros((), jnp.int32)))
        return acc

    x0 = jnp.ones((B, D), jnp.bfloat16)
    t0 = time.perf_counter()
    float(prog(x0, jnp.float32(0), ws, head_w))
    compile_t = time.perf_counter() - t0
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(prog(x0, jnp.float32(i + 1), ws, head_w))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[1]
    print(
        f"{tag:28s} {t/STEPS*1e3:8.2f} ms/step  (compile {compile_t:.0f}s)",
        flush=True,
    )


def main():
    which = set(sys.argv[1:]) or {"bf16", "pallas", "pallas_prepad", "xla", "w8a8"}
    ws, head = build_weights(jax.random.PRNGKey(0))

    if "bf16" in which:
        ws_bf = [[w.astype(jnp.bfloat16) for w in lw] for lw in ws]
        head_bf = head.astype(jnp.bfloat16)

        def mm_bf16(x, w):
            return jnp.dot(x, w, preferred_element_type=jnp.float32)

        run_loop(mm_bf16, ws_bf, head_bf, "bf16")

    ws_q = [[quant(w) for w in lw] for lw in ws]
    head_q = quant(head)

    if "pallas" in which:
        def mm_pl(x, wq):
            return _int8_matmul_pallas(x, wq[0], wq[1])

        run_loop(mm_pl, ws_q, head_q, "int8 pallas (runtime pad)")

    if "xla" in which:
        def mm_xla(x, wq):
            return _int8_matmul_xla(x, wq[0], wq[1])

        run_loop(mm_xla, ws_q, head_q, "int8 xla scale-after")

    if "w8a8" in which:
        def mm_w8(x, wq):
            return int8_matmul_w8a8(x, wq[0], wq[1])

        run_loop(mm_w8, ws_q, head_q, "int8 w8a8 native")


if __name__ == "__main__":
    main()
