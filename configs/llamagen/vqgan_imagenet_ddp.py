# LlamaGen VQGAN on ImageNet-256 (reference
# configs/llamagen/vqgan_imagenet_ddp.py).
_base_ = ["vqgan.py"]
