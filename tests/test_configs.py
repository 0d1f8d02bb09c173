"""Every shipped config must load and its algorithm must build."""

import glob
import os

import pytest

import vector_quantization_tpu.algorithms  # noqa: F401 (register everything)
from vector_quantization_tpu.registries import AlgorithmRegistry
from vector_quantization_tpu.utils.config import load_config

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

LEAF_CONFIGS = [
    "vqgan/interface.py",
    "vqgan/8192_imagenet_ddp.py",
    "vqgan/smoke.py",
    "fsq/interface.py",
    "fsq/8000_imagenet.py",
    "fsq/64000_imagenet.py",
    "vqkd/interface.py",
    "vqkd/clip_8192_imagenet.py",
    "cvqvae/interface.py",
    "cluster/interface.py",
    "ar/interface.py",
    "ar/generation_eval.py",
    "llamagen/vqgan.py",
    "llamagen/ar.py",
    "decoder/interface.py",
]


@pytest.mark.parametrize("rel", LEAF_CONFIGS)
def test_config_loads_and_algorithm_builds(rel):
    cfg = load_config(os.path.join(CONFIG_ROOT, rel))
    assert "trainer" in cfg
    algo_cfg = cfg["trainer"]["algorithm"]
    algo = AlgorithmRegistry.build(algo_cfg.copy())
    assert hasattr(algo, "train_step")
    # validator side too, when present
    if "validator" in cfg and "algorithm" in cfg["validator"]:
        AlgorithmRegistry.build(cfg["validator"]["algorithm"].copy())


def test_every_config_file_is_covered():
    all_files = {
        os.path.relpath(p, CONFIG_ROOT)
        for p in glob.glob(os.path.join(CONFIG_ROOT, "**", "*.py"), recursive=True)
    }
    covered = set(LEAF_CONFIGS) | {
        "datasets/imagenet.py",
        "datasets/synthetic.py",
        "strategies/dp.py",
        "strategies/fsdp.py",
        "strategies/single.py",
    }
    missing = all_files - covered
    assert not missing, f"configs without load-test coverage: {missing}"
