"""r5: AR train MFU — full per-block remat vs dots-saveable policy.

Full remat re-runs every projection matmul in the backward (~33% extra
FLOPs, r4 MFU 0.43); remat_policy="dots" saves projection outputs
(~8.5 GB residuals at b64) and recomputes only attention/elementwise.
Prints one JSON line per config; falls back to smaller batches on OOM.
"""

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


def bench_one(policy, batch, overhead, steps=8):
    tr = LlamaTransformer(
        vocabulary_size=VOCAB, max_length=1 + LONG, dtype=jnp.bfloat16,
        remat=True, remat_policy=policy, **AR_CFG,
    )
    tokens = jnp.zeros((batch, 1 + LONG), jnp.int32)
    params = tr.init(jax.random.PRNGKey(0), tokens[:1, :8])["params"]
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        def loss_fn(p):
            return next_token_ce(tr.apply({"params": p}, tokens), tokens)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = None
    for attempt in range(4):
        try:
            compiled = step.lower(params, opt_state, tokens).compile()
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(5 * (attempt + 1))
    flops = float(compiled.cost_analysis()["flops"])
    params, opt_state, warm = step(params, opt_state, tokens)
    float(warm)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, tokens)
    float(loss)
    np.asarray(jax.tree_util.tree_leaves(params)[0].ravel()[0])
    dt = (time.perf_counter() - t0 - overhead) / steps
    peak = 197e12
    return {
        "tokens_per_s": round(batch * (1 + LONG) / dt, 1),
        "step_ms": round(dt * 1e3, 1),
        "batch": batch,
        "mfu": round(flops / dt / peak, 3),
    }


def main():
    fn = jax.jit(lambda x: x + 1)
    float(fn(jnp.zeros((), jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(jnp.zeros((), jnp.float32)))
        ts.append(time.perf_counter() - t0)
    overhead = sorted(ts)[2]

    for policy, batches in (
        (None, (64,)),
        ("dots", (64, 48, 32)),
    ):
        for batch in batches:
            tag = f"{policy or 'full'}_b{batch}"
            try:
                out = bench_one(policy, batch, overhead)
            except Exception as exc:
                print(json.dumps(
                    {tag: {"error": f"{type(exc).__name__}: {exc}"[:200]}}
                ), flush=True)
                continue
            print(json.dumps({tag: out}), flush=True)
            break  # first batch that fits wins


if __name__ == "__main__":
    main()
