"""INT8 decode-matmul strategy shootout on the real chip.

Candidates for (B, D) @ (D, F) int8-weight matmul at decode shapes:
  A. bf16 dot (baseline the others must beat)
  B. current Pallas weight-only kernel (ops/int8_matmul.py)
  C. XLA: dot(x_bf16, w_int8.astype(bf16)) * scale   (scale AFTER dot)
  D. XLA: dot(x_bf16, w_int8.astype(bf16) * scale)   (scale inside — r2's loser)
  E. XLA native int8 MXU: quantize x per-row, int8xint8->int32 dot, rescale

Timing: jitted fori_loop chain with data dependence, scalar fetch barrier,
differential (long-short) to cancel RPC.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from vector_quantization_tpu.ops.int8_matmul import _int8_matmul_pallas

B = 64
SHAPES = [(1024, 2816), (1024, 17408)]


def chain_time(fn, x0, chain):
    @jax.jit
    def chained(x0, salt):
        def body(i, carry):
            x, acc = carry
            out = fn(x)
            # feed a perturbed slice of the output back as next input
            x = x * (1.0 + (out[0, 0] % 3) * 1e-7).astype(x.dtype)
            return (x, acc + out[0, 0])

        _, acc = jax.lax.fori_loop(
            0, chain, body, (x0 * (1.0 + salt * 1e-9), jnp.zeros((), jnp.float32))
        )
        return acc

    float(chained(x0, jnp.float32(0)))  # compile+warm
    best = float("inf")
    for i in range(3):
        salt = jnp.float32(i + 1)  # unique input per call: defeat dedup
        t0 = time.perf_counter()
        float(chained(x0, salt))
        best = min(best, time.perf_counter() - t0)
    return best


def per_call(fn, x0):
    t_s, t_l = chain_time(fn, x0, 32), chain_time(fn, x0, 544)
    return max(t_l - t_s, 1e-9) / 512


def main():
    key = jax.random.PRNGKey(0)
    for d, f in SHAPES:
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (B, d), jnp.bfloat16)
        w = jax.random.normal(kw, (d, f), jnp.float32)
        scale = jnp.maximum(jnp.abs(w).max(axis=0) / 127.0, 1e-8)
        w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        w_bf = w.astype(jnp.bfloat16)
        scale_bf = scale.astype(jnp.bfloat16)

        def a_bf16(x):
            return jnp.dot(x, w_bf, preferred_element_type=jnp.float32)

        def b_pallas(x):
            return _int8_matmul_pallas(x, w_i8, scale)

        def c_scale_after(x):
            out = jnp.dot(
                x, w_i8.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
            return out * scale

        def d_scale_inside(x):
            return jnp.dot(
                x, w_i8.astype(jnp.bfloat16) * scale_bf,
                preferred_element_type=jnp.float32,
            )

        def e_native_int8(x):
            xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
            xs = jnp.maximum(xs / 127.0, 1e-8)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / xs), -127, 127
            ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * xs * scale

        results = {}
        for name, fn in [
            ("A_bf16", a_bf16),
            ("B_pallas", b_pallas),
            ("C_xla_scale_after", c_scale_after),
                        ("E_xla_native_int8", e_native_int8),
        ]:
            try:
                t = per_call(fn, x)
                results[name] = t * 1e6  # us
            except Exception as exc:  # noqa: BLE001
                results[name] = f"FAIL {type(exc).__name__}: {exc}"[:120]
        print(f"shape ({B},{d})@({d},{f}):")
        for name, t in results.items():
            if isinstance(t, float):
                gbs = (d * f * (1 if "int8" in name or "pallas" in name.lower() or name == "B_pallas" else 2)) / (t * 1e-6) / 1e9
                print(f"  {name:22s} {t:9.1f} us   ~{gbs:7.1f} GB/s wt")
            else:
                print(f"  {name:22s} {t}")


if __name__ == "__main__":
    main()
