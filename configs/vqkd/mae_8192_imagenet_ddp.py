# VQ-KD distilled from mae, 8192 codes, ImageNet-224
# (reference configs/vqkd/mae_8192_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "teachers/mae.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
