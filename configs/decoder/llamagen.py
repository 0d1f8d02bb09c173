# Pixel-decoder stage over the frozen LlamaGen VQGAN tokenizer
# (reference configs/decoder/llamagen.py: ir = llamagen/vqgan_imagenet_ddp).
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "interface.py"),
        codebook_size=16384,
        embedding_dim=8,
        image_size=256,
        encoder=dict(type="VQGANEncoder", width=128, out_channels=8),
        distance="l2",
        normalize_inputs=True,
    ),
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
