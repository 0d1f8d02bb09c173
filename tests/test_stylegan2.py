import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.models.discriminators.stylegan2 import (
    StyleGAN2Discriminator,
)
from vector_quantization_tpu.ops.upfirdn import (
    blur_kernel_2d,
    fused_bias_leaky_relu,
    upfirdn2d,
)


class TestUpfirdn:
    def test_identity_kernel(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 2))
        k = np.zeros((1, 1), np.float32)
        k[0, 0] = 1.0
        out = upfirdn2d(x, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)

    def test_blur_shape_with_pad(self):
        x = jnp.zeros((2, 8, 8, 3))
        k = blur_kernel_2d()  # 4x4
        out = upfirdn2d(x, k, pad=(2, 1))
        # H_out = 8 + 2 + 1 - 4 + 1 = 8
        assert out.shape == (2, 8, 8, 3)

    def test_box_blur_matches_numpy(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 5, 1))
        k = np.ones((2, 2), np.float32) / 4
        out = upfirdn2d(x, k, pad=(1, 0))
        xn = np.asarray(x)[0, :, :, 0]
        xp = np.pad(xn, ((1, 0), (1, 0)))
        ref = np.zeros((5, 5))
        for i in range(5):
            for j in range(5):
                # correlation with flipped kernel == average of 2x2 window
                ref[i, j] = xp[i : i + 2, j : j + 2].mean()
        np.testing.assert_allclose(
            np.asarray(out)[0, :, :, 0], ref, rtol=1e-5, atol=1e-6
        )

    def test_upsample_doubles(self):
        x = jnp.ones((1, 4, 4, 1))
        k = np.ones((1, 1), np.float32)
        out = upfirdn2d(x, k, up=2)
        assert out.shape == (1, 8, 8, 1)

    def test_downsample_halves(self):
        x = jnp.ones((1, 8, 8, 1))
        k = np.ones((1, 1), np.float32)
        out = upfirdn2d(x, k, down=2)
        assert out.shape == (1, 4, 4, 1)

    def test_fused_bias_leaky_relu(self):
        x = jnp.asarray([[-1.0, 1.0]])
        b = jnp.asarray([0.0, 0.0])
        out = np.asarray(fused_bias_leaky_relu(x, b))
        np.testing.assert_allclose(
            out, [[-0.2 * np.sqrt(2), np.sqrt(2)]], rtol=1e-6
        )


class TestStyleGAN2Discriminator:
    def test_logit_shape(self):
        d = StyleGAN2Discriminator(image_size=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        params = d.init(jax.random.PRNGKey(1), x)
        y = d.apply(params, x)
        assert y.shape == (4, 1)

    def test_equalized_lr_weights_unit_scale(self):
        d = StyleGAN2Discriminator(image_size=16)
        x = jnp.zeros((4, 16, 16, 3))
        params = d.init(jax.random.PRNGKey(1), x)["params"]
        k = np.asarray(params["final_conv"]["kernel"])
        # stored weights are N(0,1) — equalization happens at forward time
        assert 0.5 < k.std() < 2.0

    def test_vqgan_training_with_stylegan2(self, tmp_path):
        from test_vqgan import MODEL_CFG, _algo

        from vector_quantization_tpu.data import DataLoader, SyntheticDataset
        from vector_quantization_tpu.parallel import (
            DataParallelStrategy,
            make_mesh,
        )
        from vector_quantization_tpu.training import Trainer

        algo = _algo(
            discriminator={
                "type": "StyleGAN2Discriminator",
                "image_size": 32,
                # reference widths are 512-wide at 32²; R1's double-grad
                # through that is minutes of pure FLOPs on a CPU test box
                "max_channels": 32,
            },
        )
        ds = SyntheticDataset(size=16, image_size=32)
        dl = DataLoader(ds, batch_size=8, num_workers=0)
        tr = Trainer(
            name="sg2",
            algorithm=algo,
            dataloader=dl,
            strategy=DataParallelStrategy(make_mesh({"dp": -1})),
            work_dir=str(tmp_path / "w"),
            max_iters=2,
        )
        state = tr.run()
        assert int(state.step) == 2
