# RandomResizedCrop(0.08-1.0) + HorizontalFlip on train, center-crop eval
# (reference configs/datasets/transforms/default.py).
_export_ = dict(
    trainer=dict(dataset=dict(augmentation="default")),
    validator=dict(dataset=dict(augmentation="none")),
)
