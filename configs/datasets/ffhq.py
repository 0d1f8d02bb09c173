# FFHQ 256 (reference configs/datasets/ffhq.py: vanilla dataset over
# data/ffhq-256/{train,val}).
image_size = _kwargs_.get("image_size", 256)
root = _kwargs_.get("root", "data/ffhq-256")

_export_ = dict(
    trainer=dict(
        dataset=dict(
            type="ImageFolderDataset",
            name="ffhq_train",
            root=f"{root}/train",
            num_categories=1,
            image_size=image_size,
            augmentation="default",
        ),
    ),
    validator=dict(
        dataset=dict(
            type="ImageFolderDataset",
            name="ffhq_val",
            root=f"{root}/val",
            num_categories=1,
            image_size=image_size,
            augmentation="none",
        ),
    ),
)
