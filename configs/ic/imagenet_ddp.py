# Linear probe on ImageNet (reference configs/ic/imagenet_ddp.py).
_base_ = [
    "interface.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(augmentation="weak"))
