# VQ-KD distilled from CLIP-B/16, 8192 codes (reference
# docs/pretrained_models.md:51 golden config).
_base_ = [
    "interface.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
