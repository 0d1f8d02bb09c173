# VQGAN 8192 codes + depth-2 discriminator + aglw gain 0.75 — the paper's
# main VQGAN recipe (reference configs/vqgan/8192_dd2_aglwg075_imagenet_ddp.py).
_base_ = [
    "8192_imagenet_ddp.py",
    "dd2_aglwg075.py",
]
