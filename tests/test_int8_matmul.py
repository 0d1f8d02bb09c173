import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.ops.int8_matmul import int8_matmul


class TestInt8Matmul:
    @pytest.mark.parametrize("b,d,f", [(4, 64, 48), (16, 1024, 2816)])
    def test_matches_reference(self, b, d, f):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        w = jnp.asarray(rng.integers(-127, 128, (d, f), dtype=np.int8))
        scale = jnp.asarray(rng.uniform(0.001, 0.02, f).astype(np.float32))
        ref = np.asarray(x, np.float32) @ (
            np.asarray(w, np.float32) * np.asarray(scale)
        )
        got = int8_matmul(x, w, scale, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=0.05, atol=0.5)
        got_pl = int8_matmul(x, w, scale, use_pallas=True, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got_pl), ref, rtol=0.05, atol=0.5
        )

    def test_batched_leading_dims(self):
        x = jnp.ones((2, 3, 8))
        w = jnp.ones((8, 4), jnp.int8)
        scale = jnp.full((4,), 0.5)
        out = int8_matmul(x, w, scale, use_pallas=False)
        assert out.shape == (2, 3, 4)
        np.testing.assert_allclose(np.asarray(out), 8 * 0.5)
