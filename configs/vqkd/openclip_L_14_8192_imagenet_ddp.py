# VQ-KD distilled from openclip_L_14, 8192 codes, ImageNet-224
# (reference configs/vqkd/openclip_L_14_8192_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "teachers/openclip_L_14.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
