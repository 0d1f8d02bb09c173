# FID reference-cache build (reference configs/fid/interface.py: a validator
# over the dataset's original images with the Inception statistician; run via
# python -m vector_quantization_tpu.cli.fid).
dataset = _kwargs_.get("dataset", "imagenet")
image_size = _kwargs_.get("image_size", 256)
batch_size = _kwargs_.get("batch_size", 128)

import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), f"../datasets/{dataset}.py"),
        image_size=image_size,
    ),
]

_export_ = dict(
    validator=dict(
        type="Validator",
        fid_batch_size=batch_size,
        dataloader=dict(batch_size=batch_size),
    ),
)
