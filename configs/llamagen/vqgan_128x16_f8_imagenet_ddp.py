# LlamaGen VQGAN f8, 128 codes x 16-dim
# (reference configs/llamagen/vqgan_128x16_f8_imagenet_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "vqgan.py"),
        codebook_size=128,
        embedding_dim=16,
    ),
    "../vqgan/f8.py",
]
