# Large pixel-decoder over the frozen VQ-KD tokenizer (reference
# configs/decoder/vqkd_large.py: embed_dim 1280 / depth 32 / 16 heads —
# here the VQGAN decoder widens instead, the TPU-native equivalent).
_base_ = [
    "vqkd.py",
]

runner = dict(
    algorithm=dict(
        model=dict(
            pre_decode=dict(out_channels=512),
            decoder=dict(width=256, in_channels=512),
        ),
    ),
)
trainer = runner
validator = runner
