# RandomResizedCrop with scale (0.8, 1.0) + HorizontalFlip
# (reference configs/datasets/transforms/strong.py).
_export_ = dict(
    trainer=dict(dataset=dict(augmentation="strong")),
    validator=dict(dataset=dict(augmentation="none")),
)
