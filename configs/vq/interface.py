# Vector-quantizer knob bundle (reference configs/vq/interface.py:
# num_embeddings + embedding_dim + distance fragments).
import os as _os

_dir = _os.path.dirname(__file__)
_base_ = [
    Config.load(_os.path.join(_dir, "num_embeddings.py"), **_kwargs_),
    Config.load(_os.path.join(_dir, "embedding_dim.py"), **_kwargs_),
    Config.load(_os.path.join(_dir, "distance.py"), **_kwargs_),
]

_export_ = dict()
