# OpenCLIP ViT-H/14 teacher (reference configs/vqkd/teachers/openclip_H_14.py).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "openclip.py"),
        embed_dim=1280, depth=32, num_heads=16, proj_dim=1024,
    ),
]

_export_ = dict()
