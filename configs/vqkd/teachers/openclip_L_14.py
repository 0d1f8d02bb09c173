# OpenCLIP ViT-L/14 (laion2B) teacher
# (reference configs/vqkd/teachers/openclip_L_14.py: out_chans 768).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "openclip.py"),
        embed_dim=1024, depth=24, num_heads=16, proj_dim=768,
    ),
]

_export_ = dict()
