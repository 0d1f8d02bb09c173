#!/usr/bin/env python
"""Export tokenized ImageNet in LlamaGen's dataset format (reference
``tools/tokenize_llamagen.py:27-103``): per image, ten-crop token grids
saved as ``imagenet{size}_codes/{i}.npy`` (shape (10, h, w)) plus
``imagenet{size}_labels/{i}.npy``.

    python tools/tokenize_llamagen.py NAME CONFIG --out DIR \
        [--load-model-from CKPT]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vector_quantization_tpu.cli.common import build_parser, prepare  # noqa: E402
from vector_quantization_tpu.training.runner import build_runner  # noqa: E402
from vector_quantization_tpu.utils.flags import Store  # noqa: E402


def ten_crop(img: np.ndarray, size: int) -> np.ndarray:
    """(H, W, 3) → (10, size, size, 3): 4 corners + center, + flipped."""
    h, w = img.shape[:2]
    coords = [
        (0, 0),
        (0, w - size),
        (h - size, 0),
        (h - size, w - size),
        ((h - size) // 2, (w - size) // 2),
    ]
    crops = [img[y: y + size, x: x + size] for y, x in coords]
    crops += [c[:, ::-1] for c in crops]
    return np.stack(crops)


def main() -> None:
    parser = build_parser(__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--crop-size", type=int, default=None)
    args = parser.parse_args()
    config = prepare(args)

    import jax
    import jax.numpy as jnp

    runner = build_runner(config, "validator")
    if args.work_dir:
        runner.work_dir = args.work_dir
    runner.init_state()
    if args.load_model_from:
        runner.load_model_from(args.load_model_from)
    model = runner.algorithm.model
    params = runner.state.params
    if "generator" in params:
        params = params["generator"]

    dataset = runner.dataloader.dataset
    size = args.crop_size or dataset.image_size
    codes_dir = os.path.join(args.out, f"imagenet{size}_codes")
    labels_dir = os.path.join(args.out, f"imagenet{size}_labels")
    os.makedirs(codes_dir, exist_ok=True)
    os.makedirs(labels_dir, exist_ok=True)

    @jax.jit
    def tokenize(x):
        return model.apply(
            {"params": params}, x, method=model.encode_to_quant
        )

    n = len(dataset)
    if Store.DRY_RUN:
        n = min(n, 8)
    for i in range(n):
        item = dataset[i]
        crops = ten_crop(item.image, size)
        codes = np.asarray(tokenize(jnp.asarray(crops)))
        np.save(os.path.join(codes_dir, f"{i}.npy"), codes)
        np.save(
            os.path.join(labels_dir, f"{i}.npy"),
            np.asarray([item.category]),
        )
    print(f"exported {n} items to {args.out}")


if __name__ == "__main__":
    main()
