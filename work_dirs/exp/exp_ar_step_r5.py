"""r5: AR full-train-step variants at Llama-medium — fused CE / flash /
remat / batch sweep, one process, gc between variants (a leaked ~4 GB
of buffers OOM'd the flash variants of the first ablation run).

Baseline = shipped r5 step: dots remat, dense f32 head CE, donated.
Variants toggle: fused logits-free CE (ops/fused_ce.py), Pallas flash
attention training forward, remat off (flash keeps scores out of the
residual set, so no-remat's residuals ≈ dots-policy's), batch 96/128.

Prints one JSON line per variant: honest MFU = compiled-flops / time
(dots/no-remat programs carry ~0-4% recompute in the numerator).
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
VOCAB, LONG = 1000 + 1 + 16384, 256
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


def variant(batch, fused, overhead, steps=8, **model_kw):
    tr = LlamaTransformer(
        vocabulary_size=VOCAB, max_length=1 + LONG, dtype=jnp.bfloat16,
        **AR_CFG, **model_kw,
    )
    tokens = jnp.zeros((batch, 1 + LONG), jnp.int32)
    params = tr.init(jax.random.PRNGKey(0), tokens[:1, :8])["params"]
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    opt_state = tx.init(params)

    def loss_fn(p):
        if fused:
            return tr.apply({"params": p}, tokens, fused_ce_targets=tokens)
        return next_token_ce(tr.apply({"params": p}, tokens), tokens)

    def step_fn(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step_fn, donate_argnums=(0, 1))
    compiled = step.lower(params, opt_state, tokens).compile()
    flops = float(compiled.cost_analysis()["flops"])
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
        "tokens_per_s": round(batch * (1 + LONG) / dt, 1),
        "mfu_compiled": round(flops / dt / PEAK, 3),
        "gflop": round(flops / 1e9, 1),
        "batch": batch,
    }


def main():
    overhead = rpc_overhead()
    print(json.dumps({"overhead_ms": round(overhead * 1e3, 1)}), flush=True)

    plans = [
        ("base_dots_b64",
         dict(batch=64, fused=False, remat=True, remat_policy="dots")),
        ("fused_dots_b64",
         dict(batch=64, fused=True, remat=True, remat_policy="dots")),
        ("fused_flash_dots_b64",
         dict(batch=64, fused=True, flash=True, remat=True,
              remat_policy="dots")),
        ("fused_flash_noremat_b64",
         dict(batch=64, fused=True, flash=True, remat=False)),
        ("fused_flash_dots_b128",
         dict(batch=128, fused=True, flash=True, remat=True,
              remat_policy="dots")),
        ("fused_flash_dots_b96",
         dict(batch=96, fused=True, flash=True, remat=True,
              remat_policy="dots")),
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
