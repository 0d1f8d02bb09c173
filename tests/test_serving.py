import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.models.transformers.llama import LlamaTransformer
from vector_quantization_tpu.tasks.sequence_modeling import TokenCodebook
from vector_quantization_tpu.tasks.serving import ARServer

TINY = dict(
    vocabulary_size=32,
    hidden_size=32,
    num_layers=2,
    num_heads=2,
    ffn_dim=64,
    max_length=16,
)


def _make(batch_slots=4, image_tokens=8, seed=0):
    tr = LlamaTransformer(**TINY)
    params = tr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))[
        "params"
    ]
    params = dict(params)
    params["lm_head"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["lm_head"].shape)
        * 0.1
    )
    cb = TokenCodebook(start=11, size=16)
    return ARServer(
        tr,
        params,
        cb,
        image_tokens=image_tokens,
        batch_slots=batch_slots,
        sampler={"top_k": 5},
        seed=seed,
    )


class TestARServer:
    def test_single_request_completes(self):
        server = _make()
        rid = server.submit(category=3)
        done = server.run_until_drained()
        assert len(done) == 1
        got_id, codes = done[0]
        assert got_id == rid
        assert codes.shape == (8,)
        assert (codes >= 0).all() and (codes < 16).all()

    def test_more_requests_than_slots(self):
        server = _make(batch_slots=2, image_tokens=6)
        rids = [server.submit(c) for c in range(5)]
        done = server.run_until_drained()
        assert sorted(r for r, _ in done) == rids
        for _, codes in done:
            assert codes.shape == (6,)

    def test_staggered_arrivals_interleave(self):
        server = _make(batch_slots=4, image_tokens=8)
        server.submit(0)
        # advance a few steps, then a new request joins mid-flight
        for _ in range(3):
            server.step()
        server.submit(1)
        done = server.run_until_drained()
        assert len(done) == 2
        # first submitted finishes first (it had a head start)
        assert done[0][0] == 0 or done[1][0] == 0

    def test_matches_batch_generate_distributionally(self):
        # slot decode must produce tokens in the codebook range with the
        # same per-step mechanics as batch generate; smoke-level equivalence
        server = _make(batch_slots=2, image_tokens=4, seed=1)
        server.submit(0)
        server.submit(0)
        done = server.run_until_drained()
        codes = np.stack([c for _, c in done])
        assert codes.shape == (2, 4)
        assert (codes >= 0).all() and (codes < 16).all()
