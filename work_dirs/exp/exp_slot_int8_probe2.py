"""Probe 2: which write form lets the int8 convert fuse into the dot?

- int8_dus: scalar-offset dynamic_update_slice write (generate-style)
- int8_split: per-layer (B,S,H,Dh) arrays in the carry, scatter write
- int8_gatherread: scatter write, but read via explicit dequant-scale on
  scores only (same as probe 1's int8) at HALF window (sanity: scales
  with S?)

Run: python work_dirs/exp/exp_slot_int8_probe2.py
"""

import time

import jax
import jax.numpy as jnp

L, B, S, H, Dh = 24, 64, 321, 16, 64
STEPS = 32


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {sorted(ts)[1] / STEPS * 1e3:.2f} ms/step", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, 1, H, Dh), jnp.bfloat16)
    knew = jax.random.normal(key, (B, H, Dh), jnp.float32)
    pos = jnp.full((B,), 128, jnp.int32)
    rows = jnp.arange(B)

    def attn(k_att):
        return jnp.einsum(
            "bthd,bshd->bhts", q, k_att, preferred_element_type=jnp.float32
        ).sum()

    @jax.jit
    def run_int8_dus(k_all):
        def step(i, carry):
            k_all, acc = carry
            def layer(l, ka):
                k_all, acc = ka
                sc = jnp.max(jnp.abs(knew), axis=-1) / 127.0
                kq = jnp.clip(jnp.round(knew / sc[..., None]), -127, 127)
                zero = jnp.zeros((), jnp.int32)
                k_all = jax.lax.dynamic_update_slice(
                    k_all,
                    kq[None, :, None].astype(jnp.int8),
                    (l, zero, i + 128, zero, zero),
                )
                acc = acc + attn(k_all[l].astype(jnp.bfloat16))
                return (k_all, acc)
            return jax.lax.fori_loop(0, L, layer, (k_all, acc))
        k_all, acc = jax.lax.fori_loop(
            0, STEPS, step, (k_all, jnp.float32(0))
        )
        return acc

    @jax.jit
    def run_int8_split(*k_layers):
        def step(i, carry):
            ks, acc = carry
            new_ks = []
            for l in range(L):
                kl = ks[l]
                sc = jnp.max(jnp.abs(knew), axis=-1) / 127.0
                kq = jnp.clip(jnp.round(knew / sc[..., None]), -127, 127)
                kl = kl.at[rows, pos].set(kq.astype(jnp.int8))
                acc = acc + attn(kl.astype(jnp.bfloat16))
                new_ks.append(kl)
            return (tuple(new_ks), acc)
        ks, acc = jax.lax.fori_loop(
            0, STEPS, step, (k_layers, jnp.float32(0))
        )
        return acc

    @jax.jit
    def run_bf16_split(*k_layers):
        def step(i, carry):
            ks, acc = carry
            new_ks = []
            for l in range(L):
                kl = ks[l]
                kl = kl.at[rows, pos].set(knew.astype(jnp.bfloat16))
                acc = acc + attn(kl.astype(jnp.bfloat16))
                new_ks.append(kl)
            return (tuple(new_ks), acc)
        ks, acc = jax.lax.fori_loop(
            0, STEPS, step, (k_layers, jnp.float32(0))
        )
        return acc

    ki = jnp.zeros((L, B, S, H, Dh), jnp.int8)
    timeit("int8_dus", run_int8_dus, ki)
    del ki
    kls = tuple(jnp.zeros((B, S, H, Dh), jnp.int8) for _ in range(L))
    timeit("int8_split", run_int8_split, *kls)
    del kls
    klb = tuple(jnp.zeros((B, S, H, Dh), jnp.bfloat16) for _ in range(L))
    timeit("bf16_split", run_bf16_split, *klb)


if __name__ == "__main__":
    main()
