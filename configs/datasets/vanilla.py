# Any folder of images (reference configs/datasets/vanilla.py: the vanilla
# PIL Dataset over a PILAccessLayer). _kwargs_: root, image_size.
root = _kwargs_.get("root", "data/vanilla")
image_size = _kwargs_.get("image_size", 256)

_export_ = dict(
    trainer=dict(
        dataset=dict(
            type="ImageFolderDataset",
            name="vanilla_train",
            root=root,
            image_size=image_size,
            augmentation="default",
        ),
    ),
    validator=dict(
        dataset=dict(
            type="ImageFolderDataset",
            name="vanilla_val",
            root=root,
            image_size=image_size,
            augmentation="none",
        ),
    ),
)
