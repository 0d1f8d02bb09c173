# VQ-KD distilled from evaclip, 8192 codes, ImageNet-224
# (reference configs/vqkd/evaclip_8192_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "teachers/evaclip.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
