"""r5 phase 3: one-variant-per-process AR train-step timing.

Co-resident large executables measure garbage (exp_stable_r5.py: every
variant's spread 0.3-1.2 while the 12 GB tiny control repeats to 0.5 ms
even between 2.4 s base rounds — the allocator churn of switching big
temp arenas, not chip load). bench.py's actual condition is ONE program
per process, so measure that: argv[1] = variant; each process times the
tiny-vocab control first (stability reference), then the variant.

Usage: for v in base_dots fused_fullremat fused_fr_b128; do
         python exp_proc_r5.py $v; done   (3 reps each, warm cache)
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
MODEL_GFLOP_B64 = 32514.8  # least-recompute compiled program (fused+dots)

VARIANTS = {
    "base_dots": dict(batch=64, fused=False, remat=True,
                      remat_policy="dots"),
    "fused_dots": dict(batch=64, fused=True, remat=True,
                       remat_policy="dots"),
    "fused_fullremat": dict(batch=64, fused=True, remat=True),
    "fused_fr_b128": dict(batch=128, fused=True, remat=True),
    "headbf16_dots": dict(batch=64, fused=False, remat=True,
                          remat_policy="dots", head_dtype=jnp.bfloat16),
    "base_fullremat_b128": dict(batch=128, fused=False, remat=True),
    "fused_flash_fr": dict(batch=64, fused=True, flash=True, remat=True),
    "tiny": dict(batch=64, fused=False, vocab=128, remat=True,
                 remat_policy="dots"),
}


def rpc_overhead():
    fn = jax.jit(lambda x: x + 1)
    float(fn(jnp.zeros((), jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(jnp.zeros((), jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


def run_variant(name, overhead, steps=8):
    kw = dict(VARIANTS[name])
    batch = kw.pop("batch")
    fused = kw.pop("fused")
    vocab = kw.pop("vocab", VOCAB)
    tr = LlamaTransformer(
        vocabulary_size=vocab, max_length=1 + LONG, dtype=jnp.bfloat16,
        **AR_CFG, **kw,
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
    p, o, warm = step(params, opt_state, tokens)
    float(warm)
    rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            p, o, loss = step(p, o, tokens)
        float(loss)
        np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[:1]
        rounds.append((time.perf_counter() - t0 - overhead) / steps)
    med = sorted(rounds)[1]
    del p, o, step
    gc.collect()
    return {
        "step_ms": round(med * 1e3, 1),
        "tokens_per_s": round(batch * (1 + LONG) / med, 1),
        "mfu_model": round(
            MODEL_GFLOP_B64 * (batch / 64) * 1e9 / med / PEAK, 3
        ),
        "spread": round((max(rounds) - min(rounds)) / med, 3),
        "rounds_ms": [round(t * 1e3, 1) for t in rounds],
    }


def main():
    name = sys.argv[1]
    overhead = rpc_overhead()
    out = {"variant": name, "overhead_ms": round(overhead * 1e3, 1)}
    out["tiny_control"] = run_variant("tiny", overhead, steps=4)
    if name != "tiny":
        out[name] = run_variant(name, overhead)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
