"""r5: bisect the AR train step's vocab-dependent ~400 ms inside the
REAL step (every op is fast in isolation: head+CE 11 ms, embedding
scatter 0.8 ms, optimizer ~0 — yet full vocab 779 ms vs vocab-128
419 ms with identical structure).

Variants at b64 (dots remat, donated, adamw), full 16664 vocab unless
stated; base runs FIRST and LAST to bound within-process drift:

  base            shipped step (dense f32 head + log-softmax CE)
  loss_mean       loss = mean(logits): head matmul kept, CE removed
  frozen_embhead  CE kept, but stop_gradient on embedding & lm_head
                  (no scatter bwd, no head-weight grad, tables still
                  updated by adamw with zero grads)
  head_bf16       head_dtype=bf16 (dense CE)
  tiny            vocab 128 control
  base_again      drift control

Each line also carries the compiled program's memory_analysis: arg +
output + temp bytes (the pressure hypothesis says full-vocab temps push
the 16 GB chip into a degraded schedule).
"""

import gc
import json
import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vector_quantization_tpu.models.transformers.llama import LlamaTransformer
from vector_quantization_tpu.tasks.sequence_modeling import next_token_ce

AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)
VOCAB, LONG, B = 1000 + 1 + 16384, 256, 64
PEAK = 197e12


def rpc_overhead():
    fn = jax.jit(lambda x: x + 1)
    float(fn(jnp.zeros((), jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(jnp.zeros((), jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


def variant(mode, overhead, vocab=VOCAB, steps=8, **model_kw):
    tr = LlamaTransformer(
        vocabulary_size=vocab, max_length=1 + LONG, dtype=jnp.bfloat16,
        remat=True, remat_policy="dots", **AR_CFG, **model_kw,
    )
    tokens = jnp.zeros((B, 1 + LONG), jnp.int32)
    params = tr.init(jax.random.PRNGKey(0), tokens[:1, :8])["params"]
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    opt_state = tx.init(params)

    def loss_fn(p):
        if mode == "frozen_embhead":
            p = dict(p)
            for k in ("embedding", "lm_head"):
                p[k] = jax.lax.stop_gradient(p[k])
        logits = tr.apply({"params": p}, tokens)
        if mode == "loss_mean":
            return jnp.mean(logits)
        return next_token_ce(logits, tokens)

    def step_fn(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step_fn, donate_argnums=(0, 1))
    compiled = step.lower(params, opt_state, tokens).compile()
    flops = float(compiled.cost_analysis()["flops"])
    try:
        ma = compiled.memory_analysis()
        mem = {
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
            "arg_gb": round(ma.argument_size_in_bytes / 2**30, 2),
            "out_gb": round(ma.output_size_in_bytes / 2**30, 2),
            "alias_gb": round(ma.alias_size_in_bytes / 2**30, 2),
        }
    except Exception:
        mem = None
    p, o, warm = step(params, opt_state, tokens)
    float(warm)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, loss = step(p, o, tokens)
    float(loss)
    np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0 - overhead) / steps
    return {
        "step_ms": round(dt * 1e3, 1),
        "mfu_compiled": round(flops / dt / PEAK, 3),
        "mem": mem,
    }


def main():
    overhead = rpc_overhead()
    print(json.dumps({"overhead_ms": round(overhead * 1e3, 1)}), flush=True)
    plans = [
        ("base", dict(mode="base")),
        ("loss_mean", dict(mode="loss_mean")),
        ("frozen_embhead", dict(mode="frozen_embhead")),
        ("head_bf16", dict(mode="base", head_dtype=jnp.bfloat16)),
        ("tiny", dict(mode="base", vocab=128)),
        ("base_again", dict(mode="base")),
    ]
    for name, kw in plans:
        try:
            out = variant(overhead=overhead, **kw)
        except Exception as exc:
            out = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(json.dumps({name: out}), flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
