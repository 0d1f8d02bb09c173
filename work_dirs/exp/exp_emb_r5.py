"""r5: is the embedding-gather BACKWARD (scatter-add into the 16664-row
table) the hidden ~500 ms of the AR train step?

exp_ar_opt_r5.py cleared the head matmul+CE (11 ms isolated) and the
optimizer (sgd==adamw); exp_ar_mfu_ablate_r5.py's tiny_head variant
(419 vs 920 ms) shrank BOTH the head and the embedding table. XLA TPU
lowers scatter-add with possibly-colliding indices to a serial
per-update loop — 16448 updates of 1024-wide rows would be ~0.5 s.

Probes (salted; value fetched):
  gather_V      value_and_grad of sum(emb[tokens] * r) at V=16664
  gather_128    same at V=128
  gather_onehot same at V=16664 with a one-hot-matmul custom vjp
"""

import gc
import json
import sys
import time

sys.path.append("/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

N = 64 * 257


def rpc_overhead():
    fn = jax.jit(lambda x: x + 1)
    float(fn(jnp.zeros((), jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(jnp.zeros((), jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def onehot_gather(emb, tokens):
    return emb[tokens]


def _og_fwd(emb, tokens):
    return emb[tokens], (emb.shape[0], tokens)


def _og_bwd(res, g):
    v, tokens = res
    onehot = jax.nn.one_hot(tokens, v, dtype=jnp.bfloat16)  # (N, V)
    demb = jnp.dot(
        onehot.T, g.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    return demb, None


onehot_gather.defvjp(_og_fwd, _og_bwd)


def probe(tag, v, overhead, use_onehot=False):
    emb = jax.random.normal(jax.random.PRNGKey(0), (v, 1024), jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, v)

    def loss(emb, salt):
        x = onehot_gather(emb, tokens) if use_onehot else emb[tokens]
        return jnp.sum(x.astype(jnp.float32) * salt)

    @jax.jit
    def step(salt):
        l, g = jax.value_and_grad(loss)(emb, salt)
        return l + jnp.sum(g[0, :4])

    try:
        out = step(jnp.float32(1.0))
        float(out)
        t0 = time.perf_counter()
        for i in range(8):
            out = step(jnp.float32(1.0 + 1e-6 * i))
        float(out)
        dt = (time.perf_counter() - t0 - overhead) / 8
        res = {"ms": round(dt * 1e3, 1)}
    except Exception as exc:
        res = {"error": f"{type(exc).__name__}: {exc}"[:160]}
    print(json.dumps({tag: res}), flush=True)
    gc.collect()


def main():
    overhead = rpc_overhead()
    print(json.dumps({"overhead_ms": round(overhead * 1e3, 1)}), flush=True)
    probe("gather_V16664", 16664, overhead)
    probe("gather_V128", 128, overhead)
    probe("gather_onehot_V16664", 16664, overhead, use_onehot=True)


if __name__ == "__main__":
    main()
