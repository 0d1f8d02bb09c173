import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.ops import FSQCodec


@pytest.fixture(params=[(8, 8, 5, 5, 5), (8, 8, 8, 5, 5, 5), (3, 4)])
def codec(request):
    return FSQCodec(levels=request.param)


def test_codebook_size(codec):
    assert codec.codebook_size == int(np.prod(codec.levels))


def test_radix_roundtrip(codec):
    codes = jnp.arange(codec.codebook_size, dtype=jnp.int32)
    digits = codec.from_decimal(codes)
    back = codec.to_decimal(digits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))


def test_encode_decode_roundtrip(codec):
    x = jax.random.normal(
        jax.random.PRNGKey(0), (257, codec.num_channels)
    ) * 3.0
    codes, z = codec.encode(x)
    assert codes.dtype == jnp.int32
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < codec.codebook_size).all()
    decoded = codec.decode(codes)
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(z), atol=1e-6)
    # z is on the lattice in [-1, 1]
    assert np.abs(np.asarray(z)).max() <= 1.0 + 1e-6


def test_embeddings_enumerate_lattice():
    codec = FSQCodec(levels=(3, 4))
    emb = np.asarray(codec.embeddings())
    assert emb.shape == (12, 2)
    expected = set()
    for d0, d1 in itertools.product(range(3), range(4)):
        expected.add((d0 / 1 - 1, d1 / 2 - 1))
    got = {tuple(np.round(r, 6)) for r in emb}
    assert got == {tuple(np.round(e, 6)) for e in expected}


def test_ste_gradient_passes_through():
    codec = FSQCodec(levels=(8, 8, 5))
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 3))

    def loss(x):
        _, z = codec.encode(x)
        return jnp.sum(z**2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # tanh path carries gradient


def test_quantization_is_nearest_lattice_point():
    codec = FSQCodec(levels=(5, 5))
    x = jax.random.normal(jax.random.PRNGKey(2), (100, 2)) * 0.3
    _, z = codec.encode(x)
    # every quantised value is one of the lattice coordinates
    lattice = np.asarray(codec.embeddings())
    for row in np.asarray(z):
        assert any(np.allclose(row, lp, atol=1e-5) for lp in lattice)


def test_scalar_quantizer_registered_and_quantizes():
    """ScalarQuantizer parity class (reference vq/algorithms/sq/
    quantizers.py:11-13) shares the FSQ round-STE machinery."""
    import jax
    import jax.numpy as jnp

    from vector_quantization_tpu.models.quantizers import ScalarQuantizer
    from vector_quantization_tpu.registries import QuantizerRegistry

    q = QuantizerRegistry.build({"type": "ScalarQuantizer"})
    assert isinstance(q, ScalarQuantizer)
    assert q.codebook_size == 8 * 8 * 5 * 5 * 5
    x = jax.random.normal(jax.random.PRNGKey(0), (16, q.embedding_dim))
    out = q(x)
    assert out.codes.shape == (16,)
    assert (out.codes >= 0).all() and (out.codes < q.codebook_size).all()
    # decoding the emitted code ids reproduces the quantized latents
    assert jnp.allclose(q.decode(out.codes), out.z, atol=1e-5)
