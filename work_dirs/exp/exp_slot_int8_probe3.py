"""Probe 3: late-write attention on the STACKED int8 cache.

Read the pristine carry slice (fuses: producer is the loop parameter),
compute the current token's score/value term separately, and scatter the
new k AFTER attention so the scatter result is only consumed by the next
iteration. Compare against probe 1's same-step-scatter read.

Run: python work_dirs/exp/exp_slot_int8_probe3.py
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

    @jax.jit
    def run_latewrite(k_all, sc_all):
        def step(i, carry):
            k_all, sc_all, acc = carry
            def layer(l, ka):
                k_all, sc_all, acc = ka
                sc = jnp.max(jnp.abs(knew), axis=-1) / 127.0  # (B, H)
                kq = jnp.clip(jnp.round(knew / sc[..., None]), -127, 127)
                # attention over the PRISTINE carry slice
                scores = jnp.einsum(
                    "bthd,bshd->bhts",
                    q,
                    k_all[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )  # (B, H, 1, S)
                scores = scores * sc_all[l].transpose(0, 2, 1)[:, :, None, :]
                # self term: this token's k, its own scale → (B, H)
                qf = q[:, 0].astype(jnp.float32)
                self_score = jnp.sum(qf * (kq * sc[..., None]), axis=-1)
                # overwrite the stale column at each row's position
                scores = scores.at[rows, :, 0, pos].set(self_score)
                acc = acc + scores.sum()
                # late write: result feeds the NEXT iteration only
                k_all = k_all.at[l, rows, pos].set(kq.astype(jnp.int8))
                sc_all = sc_all.at[l, rows, pos].set(sc)
                return (k_all, sc_all, acc)
            return jax.lax.fori_loop(0, L, layer, (k_all, sc_all, acc))
        k_all, sc_all, acc = jax.lax.fori_loop(
            0, STEPS, step, (k_all, sc_all, jnp.float32(0))
        )
        return acc

    ki = jnp.zeros((L, B, S, H, Dh), jnp.int8)
    sc = jnp.zeros((L, B, S, H), jnp.float32)
    timeit("int8_latewrite", run_latewrite, ki, sc)


if __name__ == "__main__":
    main()
