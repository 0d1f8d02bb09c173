"""vector_quantization_tpu — a TPU-native vector-quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``magic-research/vector_quantization`` (image tokenizers: VQGAN, CVQ-VAE, FSQ,
VQ-KD, Cluster; AR proposal networks; metrics and tooling), built TPU-first:
pure-functional models, jitted train steps with collectives inside, a fused
Pallas nearest-codebook kernel, and ``jax.sharding`` meshes instead of
DDP/FSDP process groups.
"""

__version__ = "0.1.0"

from . import registries
from .utils import Config, Registry, Store, load_config
