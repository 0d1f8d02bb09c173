# COCO 2014 (reference configs/datasets/coco_2014.py: 80 categories,
# train2014/val2014 splits).
image_size = _kwargs_.get("image_size", 256)
root = _kwargs_.get("root", "data/coco")

_export_ = dict(
    trainer=dict(
        dataset=dict(
            type="COCODataset",
            name="coco_2014_train",
            root=root,
            split="train2014",
            num_categories=80,
            image_size=image_size,
            augmentation="default",
        ),
    ),
    validator=dict(
        dataset=dict(
            type="COCODataset",
            name="coco_2014_val",
            root=root,
            split="val2014",
            num_categories=80,
            image_size=image_size,
            augmentation="none",
        ),
    ),
)
