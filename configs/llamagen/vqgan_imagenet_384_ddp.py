# LlamaGen VQGAN at 384px (24x24 code grid)
# (reference configs/llamagen/vqgan_imagenet_384_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "vqgan.py"), image_size=384
    ),
]
