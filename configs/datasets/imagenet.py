# ImageNet train/val (reference configs/datasets/imagenet.py:1-21).
# _kwargs_: image_size (default 256), root, augmentation.
image_size = _kwargs_.get("image_size", 256)
root = _kwargs_.get("root", "data/imagenet")
augmentation = _kwargs_.get("augmentation", "default")

_export_ = dict(
    trainer=dict(
        dataset=dict(
            type="ImageNetDataset",
            root=root,
            split="train",
            num_categories=1000,
            image_size=image_size,
            augmentation=augmentation,
        ),
    ),
    validator=dict(
        dataset=dict(
            type="ImageNetDataset",
            root=root,
            split="val",
            num_categories=1000,
            image_size=image_size,
            augmentation="none",
        ),
    ),
)
