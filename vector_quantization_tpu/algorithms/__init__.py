"""Algorithm plugins (reference ``vq/algorithms/``, SURVEY §2.6).

Like the reference, algorithm packages self-register into the registry tree
on import; configs name them via ``custom_imports``. Importing this package
pulls in every built-in algorithm.
"""

from .. import tasks as _tasks  # registers task models (reference custom_imports)
from ..models import teachers as _teachers  # register teacher modules
from ..models.autoencoders import vit as _vit  # register ViT encoder/decoder
from ..models.transformers import gpt2 as _gpt2  # register GPT2Transformer
from . import ar  # ARAlgorithm (LlamaGen-style proposal networks)
from . import base  # ReconstructionAlgorithm (FSQ / CVQ configs)
from . import classification  # linear-probe IC task
from . import exp_vqgan_vqkd  # experimental VQGAN+VQKD hybrid
from . import vqgan  # VQGANAlgorithm (GAN-trained tokenizer)
from . import vqkd  # VQKDAlgorithm + ClusterAlgorithm

__all__ = [
    "ar",
    "base",
    "classification",
    "exp_vqgan_vqkd",
    "vqgan",
    "vqkd",
]
