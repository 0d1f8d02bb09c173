# OpenCLIP ViT-bigG/14 teacher
# (reference configs/vqkd/teachers/openclip_bigG_14.py: out_chans 1280).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "openclip.py"),
        embed_dim=1664, depth=48, num_heads=16, proj_dim=1280,
    ),
]

_export_ = dict()
