# CelebA-HQ + FFHQ concatenation (reference configs/datasets/hq_faces.py:
# ConcatAccessLayer over the two face corpora).
image_size = _kwargs_.get("image_size", 256)


def _split(split, aug):
    return dict(
        type="ConcatDataset",
        name=f"hq_faces_{split}",
        num_categories=1,
        image_size=image_size,
        datasets=[
            dict(
                type="ImageFolderDataset",
                name=f"celeba_hq_{split}",
                root=f"data/celeba-hq-256/{split}",
                image_size=image_size,
                augmentation=aug,
            ),
            dict(
                type="ImageFolderDataset",
                name=f"ffhq_{split}",
                root=f"data/ffhq-256/{split}",
                image_size=image_size,
                augmentation=aug,
            ),
        ],
    )


_export_ = dict(
    trainer=dict(dataset=_split("train", "default")),
    validator=dict(dataset=_split("val", "none")),
)
