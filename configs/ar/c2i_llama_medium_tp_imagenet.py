# C2I Llama-medium with tensor-parallel transformer weights (tp=2 x dp)
# - the north-star sharding; train AND generate shard from config alone.
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "interface.py"), cfg=None
    ),
    "transformers/llama.py",
    "../datasets/imagenet.py",
    "../strategies/tp.py",
]
