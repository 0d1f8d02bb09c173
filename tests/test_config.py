import os
import textwrap

import pytest

from vector_quantization_tpu.utils.config import Config, load_config


@pytest.fixture
def cfg_dir(tmp_path):
    (tmp_path / "base.py").write_text(
        textwrap.dedent(
            """
            model = dict(type="VQGAN", codebook_size=8192, width=128)
            runner = dict(iters=1000)
            """
        )
    )
    (tmp_path / "child.py").write_text(
        textwrap.dedent(
            """
            _base_ = ["base.py"]
            model = dict(codebook_size=16384)
            """
        )
    )
    (tmp_path / "iface.py").write_text(
        textwrap.dedent(
            """
            k = _kwargs_.get("k", 512)
            _export_ = dict(model=dict(type="FSQ", codebook_size=k))
            """
        )
    )
    (tmp_path / "delete.py").write_text(
        textwrap.dedent(
            """
            _base_ = ["base.py"]
            model = dict(_delete_=True, type="FSQ")
            """
        )
    )
    return tmp_path


def test_base_merge(cfg_dir):
    cfg = load_config(str(cfg_dir / "child.py"))
    assert cfg.model.type == "VQGAN"
    assert cfg.model.codebook_size == 16384
    assert cfg.model.width == 128
    assert cfg.runner.iters == 1000


def test_kwargs_and_export(cfg_dir):
    cfg = load_config(str(cfg_dir / "iface.py"))
    assert cfg.model.codebook_size == 512
    cfg = load_config(str(cfg_dir / "iface.py"), k=8000)
    assert cfg.model.codebook_size == 8000
    assert "k" not in cfg  # _export_ controls the surface


def test_delete_replaces(cfg_dir):
    cfg = load_config(str(cfg_dir / "delete.py"))
    assert cfg.model == {"type": "FSQ"}


def test_override_dotted_paths():
    cfg = Config.from_obj({"a": {"b": [1, 2]}, "c": 3})
    cfg.override({"a.b[1]": 5, "c": 4, "a.new.deep": "x"})
    assert cfg.a.b == [1, 5]
    assert cfg.c == 4
    assert cfg.a.new.deep == "x"


def test_dumps_roundtrippable(cfg_dir):
    cfg = load_config(str(cfg_dir / "base.py"))
    s = cfg.dumps()
    assert "VQGAN" in s
