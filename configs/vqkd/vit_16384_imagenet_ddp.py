# VQ-KD distilled from supervised ViT, 16384 codes
# (reference configs/vqkd/vit_16384_imagenet_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "interface.py"),
        codebook_size=16384,
    ),
    "teachers/vit.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
