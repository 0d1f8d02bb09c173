# C2I GPT-2-medium without CFG
# (reference configs/ar/c2i_gpt2_medium_imagenet_ddp.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "interface.py"), cfg=None
    ),
    "transformers/gpt2.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
