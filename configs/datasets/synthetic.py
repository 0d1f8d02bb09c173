# Synthetic procedural dataset — smoke runs / benchmarks without a corpus.
image_size = _kwargs_.get("image_size", 256)
size = _kwargs_.get("size", 512)

_export_ = dict(
    trainer=dict(
        dataset=dict(
            type="SyntheticDataset",
            size=size,
            image_size=image_size,
            num_categories=10,
        ),
    ),
    validator=dict(
        dataset=dict(
            type="SyntheticDataset",
            size=max(size // 4, 8),
            image_size=image_size,
            num_categories=10,
        ),
    ),
)
