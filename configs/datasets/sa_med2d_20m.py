# SA-Med2D-20M medical imagery (reference configs/datasets/sa_med2d_20m.py,
# vq/datasets/sa_med2d.py). Single corpus, split via SplitDataset.
image_size = _kwargs_.get("image_size", 256)
root = _kwargs_.get("root", "data/sa-med2d")


def _split(split, aug):
    return dict(
        type="SplitDataset",
        name=f"sa_med2d_{split}",
        split=split,
        image_size=image_size,
        augmentation=aug,
        dataset=dict(
            type="SAMed2DDataset", root=root, image_size=image_size,
            augmentation=aug,
        ),
    )


_export_ = dict(
    trainer=dict(dataset=_split("train", "default")),
    validator=dict(dataset=_split("val", "none")),
)
