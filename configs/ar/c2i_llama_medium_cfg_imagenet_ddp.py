# C2I Llama-medium with classifier-free guidance
# (reference configs/ar/c2i_llama_medium_cfg_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "transformers/llama.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
