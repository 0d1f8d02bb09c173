"""Isolate the int8 slot-path regression: cache scatter + attention read
microbench at the serving shape, no transformer around it.

Variants:
- bf16: scatter k/v bf16, einsum read
- int8: scatter k/v int8 + scatter (L,B,S,H) f32 scales, einsum + scale
- int8_nss: int8 but scales NOT scattered (read-only) — isolates the
  scale-scatter cost
- int8_hs: scales stored (L,B,H,S) — transpose-free apply, strided scatter

Run: python work_dirs/exp/exp_slot_int8_probe.py
"""

import time

import jax
import jax.numpy as jnp

L, B, S, H, Dh = 24, 64, 321, 16, 64
STEPS = 32


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[1] / STEPS / L
    print(f"{name}: {t * 1e6:.0f} us/layer-step "
          f"({sorted(ts)[1] / STEPS * 1e3:.2f} ms/step)", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, 1, H, Dh), jnp.bfloat16)
    knew = jax.random.normal(key, (B, H, Dh), jnp.float32)
    pos = jnp.full((B,), 128, jnp.int32)
    rows = jnp.arange(B)

    def attn(k_att, sc_bh1s):
        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k_att, preferred_element_type=jnp.float32
        )
        if sc_bh1s is not None:
            scores = scores * sc_bh1s
        return scores.sum()

    @jax.jit
    def run_bf16(k_all):
        def step(i, carry):
            k_all, acc = carry
            def layer(l, ka):
                k_all, acc = ka
                k_all = k_all.at[l, rows, pos].set(
                    knew.astype(jnp.bfloat16)
                )
                acc = acc + attn(k_all[l].astype(jnp.bfloat16), None)
                return (k_all, acc)
            return jax.lax.fori_loop(0, L, layer, (k_all, acc))
        out, acc = jax.lax.fori_loop(
            0, STEPS, step, (k_all, jnp.float32(0))
        )
        return acc

    @jax.jit
    def run_int8(k_all, sc_all):
        def step(i, carry):
            k_all, sc_all, acc = carry
            def layer(l, ka):
                k_all, sc_all, acc = ka
                sc = jnp.max(jnp.abs(knew), axis=-1) / 127.0
                kq = jnp.clip(jnp.round(knew / sc[..., None]), -127, 127)
                k_all = k_all.at[l, rows, pos].set(kq.astype(jnp.int8))
                sc_all = sc_all.at[l, rows, pos].set(sc)
                sc_b = sc_all[l].transpose(0, 2, 1)[:, :, None, :]
                acc = acc + attn(k_all[l].astype(jnp.bfloat16), sc_b)
                return (k_all, sc_all, acc)
            return jax.lax.fori_loop(0, L, layer, (k_all, sc_all, acc))
        k_all, sc_all, acc = jax.lax.fori_loop(
            0, STEPS, step, (k_all, sc_all, jnp.float32(0))
        )
        return acc

    @jax.jit
    def run_int8_nss(k_all, sc_all):
        def step(i, carry):
            k_all, acc = carry
            def layer(l, ka):
                k_all, acc = ka
                sc = jnp.max(jnp.abs(knew), axis=-1) / 127.0
                kq = jnp.clip(jnp.round(knew / sc[..., None]), -127, 127)
                k_all = k_all.at[l, rows, pos].set(kq.astype(jnp.int8))
                sc_b = sc_all[l].transpose(0, 2, 1)[:, :, None, :]
                acc = acc + attn(k_all[l].astype(jnp.bfloat16), sc_b)
                return (k_all, acc)
            return jax.lax.fori_loop(0, L, layer, (k_all, acc))
        k_all, acc = jax.lax.fori_loop(
            0, STEPS, step, (k_all, jnp.float32(0))
        )
        return acc

    @jax.jit
    def run_int8_hs(k_all, sc_hs):
        # scales (L, B, H, S): transpose-free apply
        def step(i, carry):
            k_all, sc_hs, acc = carry
            def layer(l, ka):
                k_all, sc_hs, acc = ka
                sc = jnp.max(jnp.abs(knew), axis=-1) / 127.0  # (B, H)
                kq = jnp.clip(jnp.round(knew / sc[..., None]), -127, 127)
                k_all = k_all.at[l, rows, pos].set(kq.astype(jnp.int8))
                sc_hs = sc_hs.at[l, rows, :, pos].set(sc)
                sc_b = sc_hs[l][:, :, None, :]
                acc = acc + attn(k_all[l].astype(jnp.bfloat16), sc_b)
                return (k_all, sc_hs, acc)
            return jax.lax.fori_loop(0, L, layer, (k_all, sc_hs, acc))
        k_all, sc_hs, acc = jax.lax.fori_loop(
            0, STEPS, step, (k_all, sc_hs, jnp.float32(0))
        )
        return acc

    kb = jnp.zeros((L, B, S, H, Dh), jnp.bfloat16)
    timeit("bf16", run_bf16, kb)
    del kb
    ki = jnp.zeros((L, B, S, H, Dh), jnp.int8)
    sc = jnp.zeros((L, B, S, H), jnp.float32)
    timeit("int8", run_int8, ki, sc)
    timeit("int8_nss", run_int8_nss, ki, sc)
    del sc
    sch = jnp.zeros((L, B, H, S), jnp.float32)
    timeit("int8_hs", run_int8_hs, ki, sch)


if __name__ == "__main__":
    main()
