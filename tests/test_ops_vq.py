import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.ops import (
    codebook_loss,
    commitment_loss,
    cosine_distance,
    entropy_loss,
    l2_distance_sq,
    nearest_codes,
    nearest_codes_xla,
    ste,
    vq_quantize,
    vqgan_quantizer_loss,
)


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestDistances:
    def test_l2_matches_numpy(self):
        x = _rand(0, 33, 16)
        e = _rand(1, 50, 16)
        d = l2_distance_sq(x, e)
        ref = ((np.asarray(x)[:, None] - np.asarray(e)[None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d), ref, rtol=1e-4, atol=1e-4)

    def test_cosine_matches_numpy(self):
        x = _rand(0, 17, 8)
        e = _rand(1, 29, 8)
        d = cosine_distance(x, e)
        xn = np.asarray(x) / np.linalg.norm(x, axis=-1, keepdims=True)
        en = np.asarray(e) / np.linalg.norm(e, axis=-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(d), 1 - xn @ en.T, rtol=1e-4, atol=1e-5
        )


class TestNearestCodes:
    @pytest.mark.parametrize("metric", ["l2", "cosine"])
    def test_xla_matches_bruteforce(self, metric):
        x = _rand(2, 100, 8)
        e = _rand(3, 64, 8)
        codes = nearest_codes_xla(x, e, metric)
        if metric == "l2":
            ref = ((np.asarray(x)[:, None] - np.asarray(e)[None]) ** 2).sum(-1)
        else:
            xn = np.asarray(x) / np.linalg.norm(x, axis=-1, keepdims=True)
            en = np.asarray(e) / np.linalg.norm(e, axis=-1, keepdims=True)
            ref = 1 - xn @ en.T
        np.testing.assert_array_equal(np.asarray(codes), ref.argmin(-1))

    @pytest.mark.parametrize("n,k,d", [(100, 64, 8), (700, 300, 40)])
    def test_pallas_interpret_matches_xla(self, n, k, d):
        x = _rand(4, n, d)
        e = _rand(5, k, d)
        ref = nearest_codes(x, e, use_pallas=False)
        got = nearest_codes(
            x, e, use_pallas=True, interpret=True, block_n=256, block_k=128
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_quantize_gather(self):
        x = _rand(6, 10, 4)
        e = _rand(7, 16, 4)
        codes, z = vq_quantize(x, e, use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(e)[np.asarray(codes)]
        )


class TestSTE:
    def test_forward_is_z(self):
        x = jnp.array([1.0, 2.0])
        z = jnp.array([1.5, 1.5])
        np.testing.assert_allclose(np.asarray(ste(z, x)), [1.5, 1.5])

    def test_gradient_flows_to_x_only(self):
        x = jnp.array([1.0, 2.0])
        z = jnp.array([1.5, 1.5])
        gx = jax.grad(lambda x: jnp.sum(ste(z, x) ** 2))(x)
        # d/dx sum(ste^2) = 2*ste(z,x) (identity jacobian wrt x)
        np.testing.assert_allclose(np.asarray(gx), [3.0, 3.0])
        gz = jax.grad(lambda z: jnp.sum(ste(z, x) ** 2))(z)
        np.testing.assert_allclose(np.asarray(gz), [0.0, 0.0])


class TestLosses:
    def test_codebook_vs_commitment_grads(self):
        x = _rand(8, 20, 4)
        e = _rand(9, 16, 4)
        codes, z = vq_quantize(x, e, use_pallas=False)

        # codebook loss: grad hits e (via gather), not x
        ge = jax.grad(
            lambda e: codebook_loss(jnp.take(e, codes, axis=0), x)
        )(e)
        assert np.abs(np.asarray(ge)).sum() > 0
        gx = jax.grad(lambda x: codebook_loss(z, x))(x)
        np.testing.assert_allclose(np.asarray(gx), 0.0)

        # commitment: grad hits x, not e
        gx = jax.grad(lambda x: commitment_loss(z, x))(x)
        assert np.abs(np.asarray(gx)).sum() > 0

    def test_vqgan_loss_value(self):
        x = _rand(10, 20, 4)
        z = _rand(11, 20, 4)
        expected = codebook_loss(z, x) + 0.25 * commitment_loss(z, x)
        np.testing.assert_allclose(
            float(vqgan_quantizer_loss(z, x)), float(expected), rtol=1e-6
        )

    def test_entropy_loss_limits(self):
        # uniform distances -> sample entropy == avg entropy -> loss ~ 0
        d = jnp.ones((32, 16))
        assert abs(float(entropy_loss(d, temperature=1.0))) < 1e-3
        # peaked per-sample affinity, diverse codes -> negative loss
        # (note the reference softmaxes +distance/T: vq/algorithms/vq/losses.py:146)
        d = jnp.eye(16) * 100.0
        assert float(entropy_loss(d, temperature=0.01)) < -1.0
