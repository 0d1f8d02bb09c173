"""r5: AR train step time breakdown at Llama-medium b64/257 (dots remat).

The honest-basis MFU is 0.278 (exp_ar_mfu_r5.py dots_remat_b64_donated);
model matmuls at peak would be ~172 ms of the 621 ms step. This ablation
times stripped variants of the SAME step to locate the rest:

  full        baseline: value_and_grad + adamw update (donated)
  grad_only   no optimizer update (grads summed into loss chain)
  fwd_only    loss value only, no backward
  tiny_head   vocab=128: removes ~99% of the lm_head matmul + CE
              traffic from fwd AND bwd (structure otherwise identical)

Each prints one JSON line; differences between lines are the cost of the
removed piece (tunnel RPC overhead cancels in the differences).
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
PEAK = 197e12


def build(batch, vocab=VOCAB, **kw):
    tr = LlamaTransformer(
        vocabulary_size=vocab, max_length=1 + LONG, dtype=jnp.bfloat16,
        remat=True, remat_policy="dots", **AR_CFG, **kw,
    )
    tokens = jnp.zeros((batch, 1 + LONG), jnp.int32)
    params = tr.init(jax.random.PRNGKey(0), tokens[:1, :8])["params"]
    return tr, tokens, params


def timed(step, args, overhead, steps=8):
    res = step(*args)  # warm
    np.asarray(jax.tree_util.tree_leaves(res)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(steps):
        res = step(*args)
    for leaf in jax.tree_util.tree_leaves(res)[:2]:
        np.asarray(leaf).ravel()[:1]
    return (time.perf_counter() - t0 - overhead) / steps


def variant(name, batch, overhead, mode="full", vocab=VOCAB, **model_kw):
    tr, tokens, params = build(batch, vocab=vocab, **model_kw)
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    opt_state = tx.init(params)

    def loss_fn(p):
        return next_token_ce(tr.apply({"params": p}, tokens), tokens)

    if mode == "fwd_only":
        @jax.jit
        def step(params, tokens):
            return loss_fn(params)
        args = (params, tokens)
        donate = ()
    elif mode == "grad_only":
        @jax.jit
        def step(params, tokens):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            # consume grads cheaply so none are dead-code eliminated
            gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return loss + 0.0 * gsum
        args = (params, tokens)
        donate = ()
    else:
        def step_fn(params, opt_state, tokens):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        step = jax.jit(step_fn, donate_argnums=(0, 1))
        args = (params, opt_state, tokens)

    compiled = step.lower(*args).compile()
    flops = float(compiled.cost_analysis()["flops"])
    if mode in ("fwd_only", "grad_only"):
        dt = timed(step, args, overhead)
    else:
        # donated args: re-feed outputs
        p, o = params, opt_state
        p, o, warm = step(p, o, tokens)
        float(warm)
        t0 = time.perf_counter()
        for _ in range(8):
            p, o, loss = step(p, o, tokens)
        float(loss)
        np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0 - overhead) / 8
    return {
        "step_ms": round(dt * 1e3, 1),
        "tokens_per_s": round(batch * (1 + LONG) / dt, 1),
        "mfu_compiled": round(flops / dt / PEAK, 3),
        "gflop": round(flops / 1e9, 1),
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
    print(json.dumps({"overhead_ms": round(overhead * 1e3, 1)}), flush=True)

    # flash-vs-einsum logits equivalence at a small shape (bf16 model)
    try:
        tr_ref, _, p_ref = build(2)
        # the reference init zeroes the lm_head — randomise every leaf so
        # the comparison actually exercises the attention path
        leaves, treedef = jax.tree_util.tree_flatten(p_ref)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        p_ref = jax.tree_util.tree_unflatten(treedef, [
            0.02 * jax.random.normal(k, l.shape, l.dtype)
            for k, l in zip(keys, leaves)
        ])
        tr_fl = LlamaTransformer(
            vocabulary_size=VOCAB, max_length=1 + LONG, dtype=jnp.bfloat16,
            remat=True, remat_policy="dots", flash=True, **AR_CFG,
        )
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (2, 1 + LONG), 0, VOCAB
        )

        def ce_ref(p):
            return next_token_ce(tr_ref.apply({"params": p}, toks), toks)

        def ce_fl(p):
            return next_token_ce(tr_fl.apply({"params": p}, toks), toks)

        lr = jax.jit(lambda p: tr_ref.apply({"params": p}, toks))(p_ref)
        lf = jax.jit(lambda p: tr_fl.apply({"params": p}, toks))(p_ref)
        gr = jax.jit(jax.grad(ce_ref))(p_ref)
        gf = jax.jit(jax.grad(ce_fl))(p_ref)
        gdiff = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gf)
            )
        )
        gscale = max(
            float(jnp.max(jnp.abs(a)))
            for a in jax.tree_util.tree_leaves(gr)
        )
        print(json.dumps({"flash_check": {
            "logit_max_abs_diff": round(float(jnp.max(jnp.abs(lr - lf))), 5),
            "logit_max_abs": round(float(jnp.max(jnp.abs(lr))), 3),
            "grad_max_abs_diff": round(gdiff, 6),
            "grad_max_abs": round(gscale, 4),
        }}), flush=True)
    except Exception as exc:
        print(json.dumps({"flash_check": {
            "error": f"{type(exc).__name__}: {exc}"[:300]
        }}), flush=True)

    plans = [
        ("full_b64", dict(batch=64, mode="full")),
        ("grad_only_b64", dict(batch=64, mode="grad_only")),
        ("fwd_only_b64", dict(batch=64, mode="fwd_only")),
        ("tiny_head_b64", dict(batch=64, mode="full", vocab=128)),
        ("bf16_head_b64",
         dict(batch=64, mode="full", head_dtype=jnp.bfloat16)),
        ("flash_b64", dict(batch=64, mode="full", flash=True)),
        ("flash_bf16head_b64",
         dict(batch=64, mode="full", flash=True, head_dtype=jnp.bfloat16)),
        ("flash_bf16head_b96",
         dict(batch=96, mode="full", flash=True, head_dtype=jnp.bfloat16)),
        ("flash_bf16head_b128",
         dict(batch=128, mode="full", flash=True, head_dtype=jnp.bfloat16)),
    ]
    for name, kw in plans:
        try:
            out = variant(name, overhead=overhead, **kw)
        except Exception as exc:
            out = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(json.dumps({name: out}), flush=True)


if __name__ == "__main__":
    main()
