# VQGAN 16384 codes, ImageNet-256, data parallel
# (reference configs/vqgan/16384_imagenet_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "interface.py"),
        codebook_size=16384,
    ),
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
