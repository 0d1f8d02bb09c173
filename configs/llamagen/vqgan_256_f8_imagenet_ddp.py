# LlamaGen VQGAN f8, 256 codes
# (reference configs/llamagen/vqgan_256_f8_imagenet_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "vqgan.py"),
        codebook_size=256,
    ),
    "../vqgan/f8.py",
]
