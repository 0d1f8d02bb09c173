"""First-class tensor parallelism (VERDICT r1 missing #5 / next #6).

An AR config with the TP strategy leaf must TRAIN and GENERATE on the
8-virtual-device CPU mesh with tp=2, with transformer weights actually
tensor-sharded, from config alone (sizes shrunk through overrides — the
same path the CLI's --override uses).
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import vector_quantization_tpu.algorithms  # noqa: F401 (register)
from vector_quantization_tpu.training.runner import build_runner
from vector_quantization_tpu.utils.config import load_config

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "configs", "ar",
    "c2i_llama_medium_tp_imagenet.py",
)

TINY_IR = dict(
    type="AutoencoderModel",
    encoder=dict(
        type="VQGANEncoder", width=16, width_mults=(1, 2), depth_mult=1,
        out_channels=8,
    ),
    quantizer=dict(
        type="VectorQuantizer", codebook_size=32, embedding_dim=8,
        normalize_inputs=True,
    ),
    decoder=dict(
        type="VQGANDecoder", width=16, width_mults=(2, 1), depth_mult=1,
        in_channels=8,
    ),
)


def _tiny_tp_config():
    cfg = load_config(CONFIG)
    cfg.override(
        {
            "trainer.algorithm.transformer": dict(
                type="LlamaTransformer",
                hidden_size=32,
                num_layers=2,
                num_heads=2,
                ffn_dim=64,
            ),
            "trainer.algorithm.ir": TINY_IR,
            "trainer.algorithm.image_size": 32,
            "trainer.algorithm.num_categories": 10,
            "trainer.dataset": dict(
                type="SyntheticDataset", size=16, image_size=32
            ),
            "trainer.dataloader": dict(batch_size=8, num_workers=0),
            "trainer.max_iters": 2,
            "trainer.callbacks": [],
        }
    )
    return cfg


class TestTPFromConfig:
    def test_train_and_generate_tp2(self, tmp_path):
        cfg = _tiny_tp_config()
        cfg["trainer"]["work_dir"] = str(tmp_path / "w")
        tr = build_runner(cfg, "trainer")
        assert type(tr.strategy).__name__ == "TPStrategy"
        assert dict(tr.strategy.mesh.shape) == {"dp": 4, "tp": 2}

        state = tr.run()
        assert int(state.step) == 2

        # transformer weights actually tensor-sharded
        specs = [
            leaf.sharding.spec
            for leaf in jax.tree_util.tree_leaves(state.params)
            if hasattr(leaf, "sharding")
        ]
        assert any("tp" in str(s) for s in specs), specs

        # generation runs on the same tp-sharded state
        algo = tr.algorithm
        images = jax.jit(algo.generate_step)(
            state, np.arange(4, dtype=np.int32), jax.random.PRNGKey(0)
        )
        assert images.shape == (4, 32, 32, 3)
        assert np.isfinite(np.asarray(images)).all()

    def test_non_divisible_dims_fall_back_replicated(self):
        from vector_quantization_tpu.parallel import TPStrategy, make_mesh

        mesh = make_mesh({"dp": 2, "tp": 4})
        strat = TPStrategy(mesh)

        class Leaf:
            shape = (6, 10)  # not divisible by tp=4

        path = (jax.tree_util.DictKey("layer0"), jax.tree_util.DictKey("q_proj"),
                jax.tree_util.DictKey("kernel"))
        assert strat.leaf_sharding(path, Leaf()).spec == P()

    def test_requires_tp_axis(self):
        from vector_quantization_tpu.parallel import TPStrategy, make_mesh

        with pytest.raises(ValueError):
            TPStrategy(make_mesh({"dp": 8}))
