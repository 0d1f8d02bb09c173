"""Fused (logits-free) CE vs the dense log-softmax path.

The fused op replaces the reference's HF ``labels=`` CE
(``vq/algorithms/ar/transformers/hf.py:50-58``) on the training path;
these tests pin exact-shape equivalence of loss AND gradients against
the dense implementation, including a vocab that does not divide the
chunk and a chunk larger than the vocab.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.models.transformers.llama import LlamaTransformer
from vector_quantization_tpu.ops.fused_ce import fused_ce, fused_next_token_ce
from vector_quantization_tpu.tasks.sequence_modeling import next_token_ce


def dense_ce(x, w, targets):
    logits = jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], 1))


@pytest.mark.parametrize(
    "n,d,v,chunk",
    [
        (24, 16, 300, 128),  # vocab not divisible by chunk
        (24, 16, 256, 128),  # exact division
        (8, 16, 50, 128),  # chunk > vocab (single padded chunk)
    ],
)
def test_fused_matches_dense(n, d, v, chunk):
    kx, kw, kt = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (n, d), jnp.float32)
    w = jax.random.normal(kw, (d, v), jnp.float32) * 0.1
    targets = jax.random.randint(kt, (n,), 0, v)

    l0 = dense_ce(x, w, targets)
    l1 = fused_ce(x, w, targets, chunk)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5, atol=1e-5)

    g0x, g0w = jax.grad(dense_ce, argnums=(0, 1))(x, w, targets)
    g1x, g1w = jax.grad(
        lambda a, b: fused_ce(a, b, targets, chunk), argnums=(0, 1)
    )(x, w)
    # the fused backward downcasts dlogits to bf16 before its matmuls
    # (the dense autodiff keeps the f32 cotangent), so gradients agree
    # to bf16 relative precision (~2^-8), not bitwise
    np.testing.assert_allclose(
        np.asarray(g0x), np.asarray(g1x), rtol=2e-2, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g0w), np.asarray(g1w), rtol=2e-2, atol=1e-4
    )


def test_fused_next_token_matches_llama_dense_path():
    """End-to-end: fused_ce_targets apply == next_token_ce(logits)."""
    tr = LlamaTransformer(
        vocabulary_size=300, hidden_size=64, num_layers=2, num_heads=4,
        ffn_dim=128, max_length=17, dtype=jnp.float32, fused_ce_chunk=128,
    )
    toks = jax.random.randint(jax.random.PRNGKey(0), (3, 17), 0, 300)
    params = tr.init(jax.random.PRNGKey(1), toks[:1, :4])["params"]
    leaves, td = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = jax.tree_util.tree_unflatten(
        td,
        [
            0.05 * jax.random.normal(k, l.shape, l.dtype)
            for k, l in zip(ks, leaves)
        ],
    )

    def dense(p):
        return next_token_ce(tr.apply({"params": p}, toks), toks)

    def fused(p):
        return tr.apply({"params": p}, toks, fused_ce_targets=toks)

    np.testing.assert_allclose(
        float(dense(params)), float(fused(params)), rtol=2e-5, atol=2e-5
    )
    g0 = jax.grad(dense)(params)
    g1 = jax.grad(fused)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        # dense path computes the head matmul in f32; the fused path is
        # bf16 with f32 accumulation — tolerance covers that difference
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        )


def test_fused_targets_rejects_cache_path():
    tr = LlamaTransformer(
        vocabulary_size=50, hidden_size=32, num_layers=1, num_heads=2,
        ffn_dim=64, max_length=9, quantize=True,
    )
    toks = jnp.zeros((1, 9), jnp.int32)
    params = tr.init(jax.random.PRNGKey(0), toks[:, :4])["params"]
    with pytest.raises(AssertionError):
        tr.apply({"params": params}, toks, fused_ce_targets=toks)
