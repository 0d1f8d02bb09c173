# VQ-KD distilled from convnext, 8192 codes, ImageNet-224
# (reference configs/vqkd/convnext_8192_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "teachers/convnext.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
