# VQGAN 1024 codes, ImageNet-256, data parallel
# (reference configs/vqgan/1024_imagenet_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "interface.py"),
        codebook_size=1024,
    ),
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
