# Resize shorter side + RandomCrop + HorizontalFlip
# (reference configs/datasets/transforms/weak.py).
_export_ = dict(
    trainer=dict(dataset=dict(augmentation="weak")),
    validator=dict(dataset=dict(augmentation="none")),
)
