"""r5 phase 2: interleaved AR train-step shootout under footprint control.

The 14.4 GB base program's wall time swings 2.4x across runs (the 12 GB
tiny control repeats to 0.5 ms), so single-shot timings support nothing.
Protocol (the int8-microbench lesson, VERDICT r4 #4): all variants share
ONE donated (params, opt_state) buffer set, run round-robin — R rounds x
k steps each — and report per-variant median round time + spread; a
spread > 0.3 means unstable, no claim.

Variants (phase-1 footprints, work_dirs/exp/exp_mem_r5.py):
  base_dots        shipped: dense f32 head CE, dots remat   (14.36 GB)
  fused_fullremat  fused CE + full per-block remat           (5.60 GB)
  fused_flash_fr   + Pallas flash attention                  (6.26 GB)
  fused_fr_b128    fused CE + full remat at batch 128        (7.46 GB)
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
# honest model-flops basis: the least-recompute compiled program at b64
# (fused CE + dots policy, ~4% attention recompute) — 32.51 TFLOP/step
MODEL_GFLOP_B64 = 32514.8


def rpc_overhead():
    fn = jax.jit(lambda x: x + 1)
    float(fn(jnp.zeros((), jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(jnp.zeros((), jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


def build_step(batch, fused, **model_kw):
    tr = LlamaTransformer(
        vocabulary_size=VOCAB, max_length=1 + LONG, dtype=jnp.bfloat16,
        **AR_CFG, **model_kw,
    )
    tokens = jnp.zeros((batch, 1 + LONG), jnp.int32)
    tx = optax.adamw(1e-4, weight_decay=5e-2)

    def loss_fn(p):
        if fused:
            return tr.apply({"params": p}, tokens, fused_ce_targets=tokens)
        return next_token_ce(tr.apply({"params": p}, tokens), tokens)

    def step_fn(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return tr, tx, jax.jit(step_fn, donate_argnums=(0, 1)), batch


def main():
    overhead = rpc_overhead()
    print(json.dumps({"overhead_ms": round(overhead * 1e3, 1)}), flush=True)

    variants = {
        "base_dots": build_step(
            64, False, remat=True, remat_policy="dots"
        ),
        "fused_fullremat": build_step(64, True, remat=True),
        "fused_flash_fr": build_step(64, True, flash=True, remat=True),
        "fused_fr_b128": build_step(128, True, remat=True),
    }

    # one shared state: init from the first variant's transformer
    tr0 = variants["base_dots"][0]
    tokens0 = jnp.zeros((1, 8), jnp.int32)
    params = tr0.init(jax.random.PRNGKey(0), tokens0)["params"]
    tx0 = variants["base_dots"][1]
    opt_state = tx0.init(params)

    # warm every variant once (compile + first run), threading the state
    p, o = params, opt_state
    for name, (_, _, step, b) in variants.items():
        try:
            p, o, loss = step(p, o)
            float(loss)
            print(json.dumps({f"warm_{name}": "ok"}), flush=True)
        except Exception as exc:
            print(json.dumps(
                {f"warm_{name}": f"{type(exc).__name__}: {exc}"[:160]}
            ), flush=True)
            variants[name] = None
        gc.collect()

    live = {k: v for k, v in variants.items() if v is not None}
    R, K = 6, 4
    times = {k: [] for k in live}
    for r in range(R):
        for name, (_, _, step, b) in live.items():
            t0 = time.perf_counter()
            for _ in range(K):
                p, o, loss = step(p, o)
            float(loss)
            np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[:1]
            times[name].append(
                (time.perf_counter() - t0 - overhead) / K
            )
    out = {}
    for name, ts in times.items():
        b = live[name][3]
        med = sorted(ts)[len(ts) // 2]
        spread = (max(ts) - min(ts)) / med
        gflop = MODEL_GFLOP_B64 * (b / 64)
        out[name] = {
            "step_ms": round(med * 1e3, 1),
            "tokens_per_s": round(b * (1 + LONG) / med, 1),
            "mfu_model": round(gflop * 1e9 / med / PEAK, 3),
            "spread": round(spread, 3),
            "rounds_ms": [round(t * 1e3, 1) for t in ts],
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
