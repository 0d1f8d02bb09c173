# LlamaGen C2I medium (reference configs/llamagen/c2i_medium_imagenet_ddp.py).
_base_ = ["ar.py"]
