# VQ-KD distilled from vit, 8192 codes, ImageNet-224
# (reference configs/vqkd/vit_8192_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "teachers/vit.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
