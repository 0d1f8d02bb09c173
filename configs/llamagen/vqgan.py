# LlamaGen-style VQGAN (reference configs/llamagen/vqgan.py:8-37):
# 16384 codes x 8-dim normalized (spherical) codebook, 400k iters,
# discriminator start 20k, lr 1e-4. _kwargs_: codebook_size, embedding_dim,
# image_size for the variants (vqgan_128_*, vqgan_*_384, ...).
codebook_size = _kwargs_.get("codebook_size", 16384)
embedding_dim = _kwargs_.get("embedding_dim", 8)
image_size = _kwargs_.get("image_size", 256)

_base_ = [
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

import os as _os

_iface = Config.load(  # noqa: F821
    _os.path.join(_os.path.dirname(__file__), "../vqgan/interface.py"),
    codebook_size=codebook_size,
    embedding_dim=embedding_dim,
    normalize_codebook=True,
    max_iters=400_000,
    g_lr=1e-4,
    d_lr=1e-4,
    discriminator_start=20_000,
)
trainer = dict(_iface["trainer"], dataset=dict(image_size=image_size))
validator = dict(_iface["validator"], dataset=dict(image_size=image_size))
