# VQGAN 16384 codes + depth-2 discriminator + aglw gain 0.75
# (reference configs/vqgan/16384_dd2_aglwg075_imagenet_ddp.py).
_base_ = [
    "16384_imagenet_ddp.py",
    "dd2_aglwg075.py",
]
