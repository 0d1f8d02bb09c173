# LlamaGen-style VQGAN (reference configs/llamagen/vqgan.py:8-37):
# 16384 codes x 8-dim normalized (spherical) codebook, 400k iters,
# discriminator start 20k, lr 1e-4.
_base_ = [
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

import os as _os

_iface = Config.load(  # noqa: F821
    _os.path.join(_os.path.dirname(__file__), "../vqgan/interface.py"),
    codebook_size=16384,
    embedding_dim=8,
    normalize_codebook=True,
    max_iters=400_000,
    g_lr=1e-4,
    d_lr=1e-4,
    discriminator_start=20_000,
)
trainer = _iface["trainer"]
validator = _iface["validator"]
