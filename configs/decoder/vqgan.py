# Pixel-decoder stage over a frozen VQGAN-8192 tokenizer
# (reference configs/decoder/vqgan.py: ir = vqgan/8192_dd2_aglwg075).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "interface.py"),
        codebook_size=8192,
        embedding_dim=256,
        image_size=256,
        encoder=dict(type="VQGANEncoder", width=128, out_channels=256),
        distance="l2",
        normalize_inputs=False,
    ),
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
