import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.algorithms.vqkd import (
    ClusterAlgorithm,
    VQKDAlgorithm,
)
from vector_quantization_tpu.data import DataLoader, SyntheticDataset
from vector_quantization_tpu.models.autoencoders.vit import (
    ViTDecoder,
    ViTEncoder,
)
from vector_quantization_tpu.models.losses.recon import cosine_loss
from vector_quantization_tpu.models.teachers import (
    ClusterEncoder,
    ConvNeXtTeacher,
    PixelTeacher,
    ViTTeacher,
)
from vector_quantization_tpu.parallel import DataParallelStrategy, make_mesh
from vector_quantization_tpu.training import Trainer

TINY_VIT = dict(embed_dim=32, depth=2, num_heads=2)


class TestViTAutoencoder:
    def test_encoder_shapes(self):
        enc = ViTEncoder(img_size=32, patch_size=8, out_channels=8, **TINY_VIT)
        x = jnp.zeros((2, 32, 32, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 4, 4, 8)
        assert enc.downsample_factor == 8

    def test_decoder_shapes(self):
        dec = ViTDecoder(
            img_size=4, patch_size=1, in_channels=8, out_channels=24, **TINY_VIT
        )
        z = jnp.zeros((2, 4, 4, 8))
        params = dec.init(jax.random.PRNGKey(0), z)
        y = dec.apply(params, z)
        assert y.shape == (2, 4, 4, 24)

    def test_last_parameter_path(self):
        dec = ViTDecoder(
            img_size=4, patch_size=1, in_channels=8, out_channels=24, **TINY_VIT
        )
        params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
        node = params["params"]
        for k in ViTDecoder.last_parameter_path():
            node = node[k]
        assert node.shape[-1] == 24


class TestCosineLoss:
    def test_zero_for_parallel(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 8))
        assert float(cosine_loss(x, 2.0 * x)) < 1e-6

    def test_two_for_antiparallel(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
        np.testing.assert_allclose(float(cosine_loss(x, -x)), 2.0, rtol=1e-5)


class TestTeachers:
    def test_pixel_teacher(self):
        t = PixelTeacher(patch_size=8)
        img = jnp.zeros((2, 32, 32, 3), jnp.uint8)
        params = t.init(jax.random.PRNGKey(0), img)
        out = t.apply(params, img, return_2d=True)
        assert out.shape == (2, 4, 4, 3)

    def test_vit_teacher_shapes(self):
        t = ViTTeacher(patch_size=8, embed_dim=32, depth=2, num_heads=2)
        img = jnp.zeros((2, 32, 32, 3), jnp.uint8)
        params = t.init(jax.random.PRNGKey(0), img)
        out = t.apply(params, img)
        assert out.shape == (2, 16, 32)

    def test_clip_teacher_projects(self):
        from vector_quantization_tpu.models.teachers import CLIPTeacher

        t = CLIPTeacher(
            patch_size=8, embed_dim=32, depth=2, num_heads=2, proj_dim=16
        )
        img = jnp.zeros((1, 32, 32, 3), jnp.uint8)
        params = t.init(jax.random.PRNGKey(0), img)
        out = t.apply(params, img, return_2d=True)
        assert out.shape == (1, 4, 4, 16)
        assert t.out_channels == 16

    def test_convnext_teacher(self):
        t = ConvNeXtTeacher(depths=(1, 1), widths=(8, 16))
        img = jnp.zeros((1, 32, 32, 3), jnp.uint8)
        params = t.init(jax.random.PRNGKey(0), img)
        out = t.apply(params, img, return_2d=True)
        assert out.shape == (1, 4, 4, 16)

    def test_teacher_resize(self):
        t = PixelTeacher(patch_size=8, image_size=64, output_size=2)
        img = jnp.zeros((1, 32, 32, 3), jnp.uint8)
        params = t.init(jax.random.PRNGKey(0), img)
        out = t.apply(params, img, return_2d=True)
        assert out.shape == (1, 2, 2, 3)


VQKD_MODEL = {
    "type": "AutoencoderModel",
    "encoder": {
        "type": "ViTEncoder",
        "img_size": 32,
        "patch_size": 8,
        "out_channels": 8,
        **TINY_VIT,
    },
    "quantizer": {
        "type": "VectorQuantizer",
        "codebook_size": 16,
        "embedding_dim": 8,
        "distance": "cosine",
        "normalize_inputs": True,
        "codebook_init": "normal",
        "losses": {"commitment": {"weight": 1.0}},
    },
    "decoder": {
        "type": "ViTDecoder",
        "img_size": 4,
        "patch_size": 1,
        "in_channels": 8,
        "out_channels": 3,
        **TINY_VIT,
    },
    "pre_decode": {"type": "ConvConnector", "out_channels": 8},
}


class TestVQKDAlgorithm:
    def test_training_runs(self, tmp_path):
        algo = VQKDAlgorithm(
            model=VQKD_MODEL,
            teacher={"type": "PixelTeacher", "patch_size": 8},
            optimizer={"type": "adamw", "lr": 1e-3},
        )
        ds = SyntheticDataset(size=16, image_size=32)
        dl = DataLoader(ds, batch_size=8, num_workers=0)
        tr = Trainer(
            name="vqkd",
            algorithm=algo,
            dataloader=dl,
            strategy=DataParallelStrategy(make_mesh({"dp": -1})),
            work_dir=str(tmp_path / "w"),
            max_iters=3,
        )
        tr.init_state()
        cb_before = np.asarray(
            tr.state.params["quantizer"]["codebook"]
        ).copy()
        state = tr.run()
        assert "teacher_params" in state.extra
        assert bool(np.asarray(state.extra["initialized"]))
        cb_after = np.asarray(state.params["quantizer"]["codebook"])
        # codebook moved (k-means lazy init + EMA), and stays unit-norm
        assert not np.allclose(cb_before, cb_after)
        np.testing.assert_allclose(
            np.linalg.norm(cb_after, axis=-1), 1.0, rtol=1e-3
        )

    def test_teacher_params_not_optimized(self, tmp_path):
        model = dict(VQKD_MODEL)
        model["decoder"] = {**VQKD_MODEL["decoder"], "out_channels": 32}
        algo = VQKDAlgorithm(
            model=model,
            teacher={"type": "ViTTeacher", "patch_size": 8, "embed_dim": 32,
                     "depth": 1, "num_heads": 2},
            optimizer={"type": "adamw", "lr": 1e-2},
        )
        ds = SyntheticDataset(size=16, image_size=32)
        dl = DataLoader(ds, batch_size=8, num_workers=0)
        tr = Trainer(
            name="vqkd2",
            algorithm=algo,
            dataloader=dl,
            strategy=DataParallelStrategy(make_mesh({"dp": -1})),
            work_dir=str(tmp_path / "w"),
            max_iters=2,
        )
        tr.init_state()
        t_before = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), tr.state.extra["teacher_params"]
        )
        state = tr.run()
        for a, b in zip(
            jax.tree_util.tree_leaves(t_before),
            jax.tree_util.tree_leaves(state.extra["teacher_params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestClusterAlgorithm:
    def test_cluster_training(self, tmp_path):
        model = {
            "type": "TokenizerModel",
            "encoder": {
                "type": "ClusterEncoder",
                "teacher": {"type": "PixelTeacher", "patch_size": 8},
            },
            "quantizer": {
                "type": "VectorQuantizer",
                "codebook_size": 16,
                "embedding_dim": 3,
                "losses": {"codebook": {}},
            },
        }
        algo = ClusterAlgorithm(
            model=model, optimizer={"type": "adam", "lr": 1e-3}
        )
        ds = SyntheticDataset(size=16, image_size=32)
        dl = DataLoader(ds, batch_size=8, num_workers=0)
        tr = Trainer(
            name="cluster",
            algorithm=algo,
            dataloader=dl,
            strategy=DataParallelStrategy(make_mesh({"dp": -1})),
            work_dir=str(tmp_path / "w"),
            max_iters=3,
        )
        state = tr.run()
        assert int(state.step) == 3
        assert "probability" in state.extra
