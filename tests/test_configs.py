"""Every shipped config must load; every leaf's algorithm must build.

A config is a *leaf* when it exports ``trainer.algorithm`` (runnable via the
CLI); everything else is a fragment (dataset / strategy / transform / knob
file) that still has to load standalone with its kwargs defaults.
"""

import glob
import os

import pytest

import vector_quantization_tpu.algorithms  # noqa: F401 (register everything)
from vector_quantization_tpu.registries import AlgorithmRegistry
from vector_quantization_tpu.utils.config import load_config

CONFIG_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "configs")
)

ALL_CONFIGS = sorted(
    os.path.relpath(p, CONFIG_ROOT)
    for p in glob.glob(os.path.join(CONFIG_ROOT, "**", "*.py"), recursive=True)
)


@pytest.mark.parametrize("rel", ALL_CONFIGS)
def test_config_loads(rel):
    cfg = load_config(os.path.join(CONFIG_ROOT, rel))
    assert isinstance(cfg, dict)


def _leaf_configs():
    leaves = []
    for rel in ALL_CONFIGS:
        cfg = load_config(os.path.join(CONFIG_ROOT, rel))
        if "type" in cfg.get("trainer", {}).get("algorithm", {}):
            leaves.append(rel)
    return leaves


@pytest.mark.parametrize("rel", _leaf_configs())
def test_leaf_algorithm_builds(rel):
    cfg = load_config(os.path.join(CONFIG_ROOT, rel))
    algo = AlgorithmRegistry.build(cfg["trainer"]["algorithm"].copy())
    assert hasattr(algo, "train_step")
    if "algorithm" in cfg.get("validator", {}):
        AlgorithmRegistry.build(cfg["validator"]["algorithm"].copy())


def test_leaf_inventory():
    """Pin the runnable-config inventory (parity with the reference's
    leaf-config zoo; SURVEY §2 + configs/ listing)."""
    leaves = set(_leaf_configs())
    expected_families = {
        "vqgan", "cvqvae", "fsq", "sq", "vqkd", "cluster", "ar",
        "llamagen", "decoder", "ic", "exps",
    }
    families = {rel.split(os.sep)[0] for rel in leaves}
    assert expected_families <= families, (
        f"missing runnable families: {expected_families - families}"
    )
    assert len(leaves) >= 45, f"leaf count regressed: {len(leaves)}"
