import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.algorithms.vqgan import VQGANAlgorithm
from vector_quantization_tpu.data import DataLoader, SyntheticDataset
from vector_quantization_tpu.models.discriminators.patchgan import (
    PatchGANDiscriminator,
)
from vector_quantization_tpu.models.losses.gan import (
    hinge_d_loss,
    non_saturating_g_loss,
    r1_gradient_penalty,
    vanilla_g_loss,
)
from vector_quantization_tpu.parallel import DataParallelStrategy, make_mesh
from vector_quantization_tpu.training import Trainer

MODEL_CFG = {
    "type": "AutoencoderModel",
    "encoder": {
        "type": "VQGANEncoder",
        "width": 32,
        "width_mults": (1, 2),
        "depth_mult": 1,
        "out_channels": 16,
    },
    "quantizer": {
        "type": "VectorQuantizer",
        "codebook_size": 32,
        "embedding_dim": 16,
        "losses": {"vqgan": {"beta": 0.25}},
    },
    "decoder": {
        "type": "VQGANDecoder",
        "width": 32,
        "width_mults": (2, 1),
        "depth_mult": 1,
        "in_channels": 16,
        "attention_layer": None,
        "refine_layer": None,
    },
}


class TestGANLosses:
    def test_hinge_d_loss(self):
        fake = jnp.array([-2.0, 0.0])
        real = jnp.array([2.0, 0.0])
        # relu(1+fake)=[0,1]; relu(1-real)=[0,1] -> mean((f+r)/2)=0.5
        np.testing.assert_allclose(float(hinge_d_loss(fake, real)), 0.5)

    def test_g_losses(self):
        fake = jnp.array([1.0, -1.0])
        np.testing.assert_allclose(float(vanilla_g_loss(fake)), 0.0)
        assert float(non_saturating_g_loss(fake)) > 0

    def test_r1_penalty_linear_disc(self):
        # D(x) = sum(2x) -> grad=2 everywhere -> ||g||^2 = 4*numel
        x = jnp.ones((2, 4, 4, 3))
        r1 = r1_gradient_penalty(lambda x: 2.0 * x, x)
        np.testing.assert_allclose(float(r1), 4 * 4 * 4 * 3, rtol=1e-6)


class TestPatchGAN:
    def test_output_is_patch_logits(self):
        d = PatchGANDiscriminator(width=16, depth=2)
        x = jnp.zeros((2, 32, 32, 3))
        vars_ = d.init(jax.random.PRNGKey(0), x, train=False)
        y = d.apply(vars_, x, train=False)
        assert y.shape[0] == 2 and y.shape[-1] == 1
        assert "batch_stats" in vars_

    def test_batch_stats_update_in_train(self):
        d = PatchGANDiscriminator(width=16, depth=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        vars_ = d.init(jax.random.PRNGKey(0), x, train=False)
        _, updates = d.apply(vars_, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(vars_["batch_stats"])
        after = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )


def _algo(**kw):
    kw.setdefault("model", MODEL_CFG)
    kw.setdefault(
        "discriminator",
        {"type": "PatchGANDiscriminator", "width": 16, "depth": 2},
    )
    kw.setdefault("optimizer", {"type": "adam", "lr": 1e-4, "betas": (0.5, 0.9)})
    kw.setdefault(
        "d_optimizer", {"type": "adam", "lr": 4e-4, "betas": (0.5, 0.9)}
    )
    kw.setdefault("recon_losses", {"l1": {}, "mse": {}})
    return VQGANAlgorithm(**kw)


class TestVQGANTraining:
    def _run(self, tmp_path, algo, iters=3):
        ds = SyntheticDataset(size=16, image_size=32)
        dl = DataLoader(ds, batch_size=8, num_workers=0)
        tr = Trainer(
            name="vqgan",
            algorithm=algo,
            dataloader=dl,
            strategy=DataParallelStrategy(make_mesh({"dp": -1})),
            work_dir=str(tmp_path / "w"),
            max_iters=iters,
        )
        return tr.run()

    def test_gan_training_runs_and_updates_both(self, tmp_path):
        algo = _algo()
        state = self._run(tmp_path, algo)
        assert int(state.step) == 3
        assert state.d_opt_state is not None
        leaves = jax.tree_util.tree_leaves(state.params["discriminator"])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_discriminator_start_gates_d_updates(self, tmp_path):
        algo = _algo(discriminator_start=1000)
        ds = SyntheticDataset(size=16, image_size=32)
        dl = DataLoader(ds, batch_size=8, num_workers=0)
        tr = Trainer(
            name="vqgan2",
            algorithm=algo,
            dataloader=dl,
            strategy=DataParallelStrategy(make_mesh({"dp": -1})),
            work_dir=str(tmp_path / "w2"),
            max_iters=2,
        )
        tr.init_state()
        d_before = jax.tree_util.tree_map(
            lambda x: np.asarray(x).copy(), tr.state.params["discriminator"]
        )
        state = tr.run()
        d_after = state.params["discriminator"]
        for a, b in zip(
            jax.tree_util.tree_leaves(d_before),
            jax.tree_util.tree_leaves(d_after),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_r1_penalty_runs(self, tmp_path):
        algo = _algo(r1_weight=0.1)
        state = self._run(tmp_path, algo, iters=2)
        assert int(state.step) == 2

    def test_normalized_codebook_update(self, tmp_path):
        # LlamaGen-style: spherical codebook via normalize update
        cfg = dict(MODEL_CFG)
        cfg["quantizer"] = {
            **MODEL_CFG["quantizer"],
            "normalize_inputs": True,
        }
        algo = _algo(model=cfg, codebook_update={"type": "normalize"})
        state = self._run(tmp_path, algo, iters=2)
        cb = np.asarray(state.params["generator"]["quantizer"]["codebook"])
        np.testing.assert_allclose(
            np.linalg.norm(cb, axis=-1), 1.0, rtol=1e-4
        )

    def test_eval_step(self, tmp_path):
        algo = _algo()
        state = self._run(tmp_path, algo, iters=1)
        ds = SyntheticDataset(size=8, image_size=32)
        batch = next(iter(DataLoader(ds, batch_size=8, num_workers=0)))
        memo = jax.jit(algo.eval_step)(
            state, {"image": jnp.asarray(batch["image"])}
        )
        assert memo["pred"].shape == (8, 32, 32, 3)
        assert np.isfinite(float(memo["r_loss"]))


class TestVQGANWithLPIPS:
    def test_lpips_recon_loss_trains(self, tmp_path):
        algo = _algo(recon_losses={"l1": {}, "lpips": {"weight": 0.5}})
        ds = SyntheticDataset(size=16, image_size=32)
        dl = DataLoader(ds, batch_size=8, num_workers=0)
        tr = Trainer(
            name="vqgan_lpips",
            algorithm=algo,
            dataloader=dl,
            strategy=DataParallelStrategy(make_mesh({"dp": -1})),
            work_dir=str(tmp_path / "w"),
            max_iters=2,
        )
        state = tr.run()
        assert int(state.step) == 2
        assert "lpips_params" in state.extra
