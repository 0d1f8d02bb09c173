# SATIN satellite imagery (reference configs/datasets/satin.py,
# vq/datasets/satin.py). Single corpus, split via SplitDataset.
image_size = _kwargs_.get("image_size", 256)
root = _kwargs_.get("root", "data/satin")


def _split(split, aug):
    return dict(
        type="SplitDataset",
        name=f"satin_{split}",
        split=split,
        image_size=image_size,
        augmentation=aug,
        dataset=dict(
            type="SATINDataset", root=root, image_size=image_size,
            augmentation=aug,
        ),
    )


_export_ = dict(
    trainer=dict(dataset=_split("train", "default")),
    validator=dict(dataset=_split("val", "none")),
)
