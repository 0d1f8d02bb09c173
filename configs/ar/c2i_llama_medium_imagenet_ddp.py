# C2I Llama-medium without CFG
# (reference configs/ar/c2i_llama_medium_imagenet_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "interface.py"), cfg=None
    ),
    "transformers/llama.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
