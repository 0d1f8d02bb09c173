import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.data import DataLoader, SyntheticDataset
from vector_quantization_tpu.parallel import DataParallelStrategy, make_mesh
from vector_quantization_tpu.training import Trainer

IR_CFG = {
    "type": "AutoencoderModel",
    "encoder": {
        "type": "VQGANEncoder",
        "width": 16,
        "width_mults": (1, 2),
        "depth_mult": 1,
        "out_channels": 8,
        "attention_layer": None,
        "refine_layer": None,
    },
    "quantizer": {
        "type": "VectorQuantizer",
        "codebook_size": 32,
        "embedding_dim": 8,
    },
    "decoder": {
        "type": "VQGANDecoder",
        "width": 16,
        "width_mults": (2, 1),
        "depth_mult": 1,
        "in_channels": 8,
        "attention_layer": None,
        "refine_layer": None,
    },
}


def _run_trainer(tmp_path, algo, iters=2, batch=8):
    ds = SyntheticDataset(size=16, image_size=32)
    dl = DataLoader(ds, batch_size=batch, num_workers=0)
    tr = Trainer(
        name="t",
        algorithm=algo,
        dataloader=dl,
        strategy=DataParallelStrategy(make_mesh({"dp": -1})),
        work_dir=str(tmp_path / "w"),
        max_iters=iters,
    )
    return tr.run()


class TestEMAShadow:
    def test_ema_params_track_model(self, tmp_path):
        from vector_quantization_tpu.algorithms.base import (
            ReconstructionAlgorithm,
        )

        algo = ReconstructionAlgorithm(
            model=IR_CFG,
            optimizer={"type": "adam", "lr": 1e-2},
            ema_decay=0.9,
        )
        state = _run_trainer(tmp_path, algo, iters=3)
        assert "ema_params" in state.extra
        # ema lags behind live params but is not identical to init
        p = jax.tree_util.tree_leaves(state.params)[0]
        e = jax.tree_util.tree_leaves(state.extra["ema_params"])[0]
        assert not np.allclose(np.asarray(p), np.asarray(e))


class TestClassification:
    def test_linear_probe_trains_and_evals(self, tmp_path):
        from vector_quantization_tpu.algorithms.classification import (
            ClassificationAlgorithm,
        )

        algo = ClassificationAlgorithm(
            ir=IR_CFG,
            num_categories=10,
            image_size=32,
            optimizer={"type": "lars", "lr": 0.1},
        )
        state = _run_trainer(tmp_path, algo, iters=3)
        assert int(state.step) == 3
        batch = {
            "image": jnp.zeros((8, 32, 32, 3)),
            "category": jnp.arange(8) % 10,
        }
        memo = jax.jit(algo.eval_step)(state, batch)
        assert 0 <= float(memo["accuracy"]) <= 1


class TestGPT2:
    def test_forward_and_cache(self):
        from vector_quantization_tpu.models.transformers.gpt2 import (
            GPT2Transformer,
        )

        tr = GPT2Transformer(
            vocabulary_size=50,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            max_length=16,
        )
        tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 0, 50)
        params = tr.init(jax.random.PRNGKey(1), tokens)["params"]
        full = tr.apply({"params": params}, tokens)
        assert full.shape == (2, 10, 50)

        cache = tr.init_cache(2, dtype=jnp.float32)
        logits, cache = tr.apply({"params": params}, tokens[:, :5], cache)
        for i in range(5, 10):
            logits, cache = tr.apply(
                {"params": params}, tokens[:, i : i + 1], cache
            )
        np.testing.assert_allclose(
            np.asarray(logits[:, -1]), np.asarray(full[:, -1]), atol=2e-3
        )

    def test_head_tied_to_embedding(self):
        from vector_quantization_tpu.models.transformers.gpt2 import (
            GPT2Transformer,
        )

        tr = GPT2Transformer(
            vocabulary_size=50, hidden_size=32, num_layers=1, num_heads=2,
            max_length=8,
        )
        tokens = jnp.zeros((1, 4), jnp.int32)
        params = tr.init(jax.random.PRNGKey(0), tokens)["params"]
        assert "wte" in params and "lm_head" not in params


class TestVQGANVQKDHybrid:
    def test_hybrid_training(self, tmp_path):
        from vector_quantization_tpu.algorithms.exp_vqgan_vqkd import (
            VQGANVQKDAlgorithm,
        )

        model = {
            **IR_CFG,
            "type": "VQGANVQKDModel",
            "vqkd_decoder": {
                "type": "VQGANDecoder",
                "width": 16,
                "width_mults": (1,),
                "depth_mult": 1,
                "in_channels": 8,
                "out_channels": 3,
                "attention_layer": None,
                "refine_layer": None,
            },
            "vqkd_pre_decode": {"type": "ConvConnector"},
        }
        algo = VQGANVQKDAlgorithm(
            model=model,
            discriminator={
                "type": "PatchGANDiscriminator", "width": 16, "depth": 2
            },
            teacher={"type": "PixelTeacher", "patch_size": 2},
            optimizer={"type": "adam", "lr": 1e-4},
            recon_losses={"l1": {}},
        )
        state = _run_trainer(tmp_path, algo, iters=2)
        assert int(state.step) == 2
        assert "teacher_params" in state.extra
