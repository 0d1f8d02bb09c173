# VQGAN 8192 codes, ImageNet-256, data parallel
# (reference configs/vqgan/8192_dd2_aglwg075_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
