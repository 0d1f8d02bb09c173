# C2I GPT-2-medium with CFG
# (reference configs/ar/c2i_gpt2_medium_cfg_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "transformers/gpt2.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
