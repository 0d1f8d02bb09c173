# Resize shorter side + CenterCrop, no augmentation
# (reference configs/datasets/transforms/none.py).
_export_ = dict(
    trainer=dict(dataset=dict(augmentation="none")),
    validator=dict(dataset=dict(augmentation="none")),
)
