import pytest

from vector_quantization_tpu.utils.config import Config
from vector_quantization_tpu.utils.registry import Registry, RegistryError


@pytest.fixture
def tree():
    root = Registry("TestRoot")
    models = root.child("models")
    quantizers = models.child("quantizers")

    @models.register()
    class Encoder:
        def __init__(self, width=64):
            self.width = width

    @quantizers.register()
    class VQ:
        def __init__(self, codebook_size, embedding_dim=8):
            self.codebook_size = codebook_size
            self.embedding_dim = embedding_dim

        @classmethod
        def build_pre_hook(cls, config, registry):
            config.setdefault("embedding_dim", 16)
            return config

    return root


def test_hierarchical_lookup(tree):
    assert tree.get("VQ").__name__ == "VQ"
    assert tree.get("models.quantizers.VQ").__name__ == "VQ"
    assert tree.get("TestRoot.models.Encoder").__name__ == "Encoder"
    with pytest.raises(RegistryError):
        tree.get("Nope")


def test_build_with_pre_hook(tree):
    obj = tree.build(Config(type="VQ", codebook_size=512))
    assert obj.codebook_size == 512
    assert obj.embedding_dim == 16  # set by pre-hook


def test_build_or_return(tree):
    built = tree.build_or_return({"type": "Encoder", "width": 32})
    assert built.width == 32
    sentinel = object()
    assert tree.build_or_return(sentinel) is sentinel


def test_duplicate_registration_raises(tree):
    with pytest.raises(RegistryError):

        @tree.child("models").register("Encoder")
        class Encoder2:
            pass
