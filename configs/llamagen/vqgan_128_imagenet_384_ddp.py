# LlamaGen VQGAN, tiny 128-code codebook at 384px
# (reference configs/llamagen/vqgan_128_imagenet_384_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "vqgan.py"),
        image_size=384,
        codebook_size=128,
    ),
]
