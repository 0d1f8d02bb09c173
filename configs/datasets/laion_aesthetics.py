# LAION-Aesthetics (reference configs/datasets/laion_aesthetics.py +
# vq/datasets/laion_aesthetics.py:18-37): single corpus with a deterministic
# 25k val carve-out and decode-retry.
image_size = _kwargs_.get("image_size", 256)
root = _kwargs_.get("root", "data/laion-aesthetics")

_export_ = dict(
    trainer=dict(
        dataset=dict(
            type="LAIONAestheticsDataset",
            root=root,
            split="train",
            image_size=image_size,
            augmentation="default",
        ),
    ),
    validator=dict(
        dataset=dict(
            type="LAIONAestheticsDataset",
            root=root,
            split="val",
            image_size=image_size,
            augmentation="none",
        ),
    ),
)
