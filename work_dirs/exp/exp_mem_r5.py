"""r5 phase 1: compiled memory footprints of AR train-step configs.

The full-vocab b64 step occupies 14.35 GB of the 16 GB chip (temp 10.51
+ aliased state 3.84) and its wall time swings 621→2455 ms across runs
while the 12.3 GB tiny-vocab step repeats to 0.5 ms — footprint, not
op cost, is the variable to optimise. Compile-only (warm cache): print
temp/arg bytes per config, cheapest first wins a timed interleave.
"""

import json
import sys

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import optax

from vector_quantization_tpu.models.transformers.llama import LlamaTransformer
from vector_quantization_tpu.tasks.sequence_modeling import next_token_ce

AR_CFG = dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816)
VOCAB, LONG, B = 1000 + 1 + 16384, 256, 64


def footprint(name, batch=B, fused=False, **model_kw):
    tr = LlamaTransformer(
        vocabulary_size=VOCAB, max_length=1 + LONG, dtype=jnp.bfloat16,
        **AR_CFG, **model_kw,
    )
    tokens = jnp.zeros((batch, 1 + LONG), jnp.int32)
    params = jax.eval_shape(
        lambda: tr.init(jax.random.PRNGKey(0), tokens[:1, :8])["params"]
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
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
    try:
        compiled = step.lower(params, opt_state, tokens).compile()
        ma = compiled.memory_analysis()
        flops = float(compiled.cost_analysis()["flops"])
        out = {
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
            "arg_gb": round(ma.argument_size_in_bytes / 2**30, 2),
            "total_gb": round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes) / 2**30,
                2,
            ),
            "gflop": round(flops / 1e9, 1),
            "batch": batch,
        }
    except Exception as exc:
        out = {"error": f"{type(exc).__name__}: {exc}"[:160]}
    print(json.dumps({name: out}), flush=True)
    import gc

    gc.collect()


def main():
    plans = [
        ("base_dots", dict(remat=True, remat_policy="dots")),
        ("full_remat", dict(remat=True)),
        ("fused_dots", dict(fused=True, remat=True, remat_policy="dots")),
        ("fused_full_remat", dict(fused=True, remat=True)),
        ("fused_flash_dots",
         dict(fused=True, flash=True, remat=True, remat_policy="dots")),
        ("fused_flash_full_remat", dict(fused=True, flash=True, remat=True)),
        ("fused_flash_noremat", dict(fused=True, flash=True, remat=False)),
        ("headbf16_dots",
         dict(head_dtype=jnp.bfloat16, remat=True, remat_policy="dots")),
        ("fused_full_remat_b128",
         dict(fused=True, remat=True, batch=128)),
        ("fused_flash_dots_b96",
         dict(fused=True, flash=True, remat=True, remat_policy="dots",
              batch=96)),
    ]
    for name, kw in plans:
        footprint(name, **kw)


if __name__ == "__main__":
    main()
