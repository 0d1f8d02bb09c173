"""r5: isolate the AR train step's lm_head+CE cost and prototype fixes.

exp_ar_mfu_ablate_r5.py: full step 920 ms vs tiny-vocab (128) step
419 ms — the (16448, 1024) x (1024, 16664) head matmul + log-softmax CE
complex costs ~500 ms/step where its flops+traffic say ~60 ms. Probes
(all salted per-iter so the tunnel's dispatch dedup can't fake timings):

  head_f32    value_and_grad of CE(x@W) with f32 operands (shipped path)
  head_bf16   same with bf16 operands, f32 accumulation
  head_fused  chunked custom-vjp CE: online logsumexp over vocab chunks,
              logits NEVER materialised; backward recomputes each chunk
  update_adamw / update_sgd  the optimizer tail in isolation (salted)
  full_sgd / full_adamw      whole step, donated
"""

import functools
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
N = B * (1 + LONG)  # 16448 rows


def rpc_overhead():
    fn = jax.jit(lambda x: x + 1)
    float(fn(jnp.zeros((), jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(jnp.zeros((), jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2]


# -- fused CE prototype ------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ce(x, w, targets, chunk=2048):
    loss, _ = _fused_ce_fwd(x, w, targets, chunk)
    return loss


def _chunks(w, chunk):
    d, v = w.shape
    nc = -(-v // chunk)
    wp = jnp.pad(w, ((0, 0), (0, nc * chunk - v)))
    return wp.reshape(d, nc, chunk).transpose(1, 0, 2), nc


def _fused_ce_fwd(x, w, targets, chunk):
    d, v = w.shape
    wc, nc = _chunks(w, chunk)
    xb = x.astype(jnp.bfloat16)

    def body(carry, args):
        m, s, tlog = carry
        wi, ci = args
        logits = jnp.dot(
            xb, wi.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        cols = ci * chunk + jnp.arange(chunk)
        logits = jnp.where(cols[None, :] < v, logits, -1e30)
        m_c = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, m_c)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1
        )
        in_c = (targets >= ci * chunk) & (targets < (ci + 1) * chunk)
        idx = jnp.clip(targets - ci * chunk, 0, chunk - 1)
        t_here = jnp.take_along_axis(logits, idx[:, None], 1)[:, 0]
        tlog = jnp.where(in_c, t_here, tlog)
        return (m_new, s, tlog), None

    n = x.shape[0]
    init = (
        jnp.full((n,), -1e30, jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    (m, s, tlog), _ = jax.lax.scan(
        body, init, (wc, jnp.arange(nc))
    )
    lse = m + jnp.log(s)
    loss = jnp.mean(lse - tlog)
    return loss, (x, w, targets, lse)


def _fused_ce_bwd(chunk, res, g):
    x, w, targets, lse = res
    d, v = w.shape
    n = x.shape[0]
    wc, nc = _chunks(w, chunk)
    xb = x.astype(jnp.bfloat16)
    scale = g / n

    def body(dx, args):
        wi, ci = args
        logits = jnp.dot(
            xb, wi.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        cols = ci * chunk + jnp.arange(chunk)
        logits = jnp.where(cols[None, :] < v, logits, -1e30)
        p = jnp.exp(logits - lse[:, None])
        onehot = (targets[:, None] == cols[None, :]).astype(jnp.float32)
        dlog = (p - onehot) * scale
        dlogb = dlog.astype(jnp.bfloat16)
        dx = dx + jnp.dot(
            dlogb, wi.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        dwi = jnp.dot(xb.T, dlogb, preferred_element_type=jnp.float32)
        return dx, dwi

    dx, dwc = jax.lax.scan(
        body, jnp.zeros((n, d), jnp.float32), (wc, jnp.arange(nc))
    )
    dw = dwc.transpose(1, 0, 2).reshape(d, nc * chunk)[:, :v]
    return dx.astype(x.dtype), dw, None


fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


# -- probes ------------------------------------------------------------------


def timed_salted(make_step, overhead, iters=8):
    """make_step(salt_scalar) -> value; salt defeats dispatch dedup."""
    step = jax.jit(make_step)
    out = step(jnp.float32(0.0))
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(jnp.float32(1e-9 * (i + 1)))
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0 - overhead) / iters


def head_probes(overhead):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, 1024), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (1024, VOCAB),
                          jnp.float32) * 0.02
    targets = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, VOCAB)

    def ce_dense(xs, ws, dtype):
        logits = jnp.dot(
            xs.astype(dtype), ws.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], 1))

    out = {}

    def probe(tag, fn):
        def step(salt):
            xs = x * (1.0 + salt)
            loss, (dx, dw) = jax.value_and_grad(
                lambda a, b: fn(a, b), argnums=(0, 1)
            )(xs, w)
            return loss + jnp.sum(dx[0, :4]) + jnp.sum(dw[0, :4])

        try:
            dt = timed_salted(step, overhead)
            out[tag] = {"ms": round(dt * 1e3, 1)}
        except Exception as exc:
            out[tag] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
        print(json.dumps({tag: out[tag]}), flush=True)
        import gc
        gc.collect()

    probe("head_f32", lambda a, b: ce_dense(a, b, jnp.float32))
    probe("head_bf16", lambda a, b: ce_dense(a, b, jnp.bfloat16))
    probe("head_fused", lambda a, b: fused_ce(a, b, targets))

    # numeric check fused vs dense
    l0 = float(jax.jit(lambda: ce_dense(x, w, jnp.float32))())
    l1 = float(jax.jit(lambda: fused_ce(x, w, targets))())
    g0 = jax.jit(jax.grad(lambda b: ce_dense(x, b, jnp.float32)))(w)
    g1 = jax.jit(jax.grad(lambda b: fused_ce(x, b, targets)))(w)
    print(json.dumps({"fused_check": {
        "loss_dense": round(l0, 5), "loss_fused": round(l1, 5),
        "grad_max_abs_diff": float(jnp.max(jnp.abs(g0 - g1))),
        "grad_max_abs": float(jnp.max(jnp.abs(g0))),
    }}), flush=True)


def update_probes(overhead):
    tr = LlamaTransformer(
        vocabulary_size=VOCAB, max_length=1 + LONG, dtype=jnp.bfloat16,
        remat=True, remat_policy="dots", **AR_CFG,
    )
    tokens = jnp.zeros((B, 1 + LONG), jnp.int32)
    params = tr.init(jax.random.PRNGKey(0), tokens[:1, :8])["params"]

    for tag, tx in (
        ("update_adamw", optax.adamw(1e-4, weight_decay=5e-2)),
        ("update_sgd", optax.sgd(1e-4)),
    ):
        opt_state = tx.init(params)

        def step(salt):
            grads = jax.tree_util.tree_map(
                lambda l: jnp.full_like(l, 1e-6) * (1.0 + salt), params
            )
            updates, new_o = tx.update(grads, opt_state, params)
            new_p = optax.apply_updates(params, updates)
            return jax.tree_util.tree_leaves(new_p)[0][..., :1]

        try:
            dt = timed_salted(step, overhead)
            res = {"ms": round(dt * 1e3, 1)}
        except Exception as exc:
            res = {"error": f"{type(exc).__name__}: {exc}"[:160]}
        print(json.dumps({tag: res}), flush=True)
        import gc
        gc.collect()

    for tag, tx in (
        ("full_sgd", optax.sgd(1e-4)),
        ("full_adamw", optax.adamw(1e-4, weight_decay=5e-2)),
    ):
        opt_state = tx.init(params)

        def loss_fn(p):
            return next_token_ce(tr.apply({"params": p}, tokens), tokens)

        def step_fn(params, opt_state, tokens):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        step = jax.jit(step_fn, donate_argnums=(0, 1))
        try:
            p = jax.tree_util.tree_map(jnp.copy, params)
            o = opt_state
            p, o, warm = step(p, o, tokens)
            float(warm)
            t0 = time.perf_counter()
            for _ in range(8):
                p, o, loss = step(p, o, tokens)
            float(loss)
            np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[:1]
            dt = (time.perf_counter() - t0 - rpc) / 8
            res = {"step_ms": round(dt * 1e3, 1),
                   "tokens_per_s": round(B * (1 + LONG) / dt, 1)}
        except Exception as exc:
            res = {"error": f"{type(exc).__name__}: {exc}"[:160]}
        print(json.dumps({tag: res}), flush=True)
        p = o = None
        import gc
        gc.collect()


if __name__ == "__main__":
    rpc = rpc_overhead()
    print(json.dumps({"overhead_ms": round(rpc * 1e3, 1)}), flush=True)
    head_probes(rpc)
    update_probes(rpc)
