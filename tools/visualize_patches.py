#!/usr/bin/env python
"""Token → representative image patches collage (reference
``tools/visualize_patches.py:37-60``): tokenize a dataset, then for each of
the requested code ids collect the image patches that mapped to it and save
a grid.

    python tools/visualize_patches.py NAME CONFIG --tokens 0 17 42 \
        [--load-model-from CKPT] --out patches.png
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vector_quantization_tpu.cli.common import build_parser, prepare  # noqa: E402
from vector_quantization_tpu.training.runner import build_runner  # noqa: E402
from vector_quantization_tpu.utils.flags import Store  # noqa: E402


def main() -> None:
    parser = build_parser(__doc__)
    parser.add_argument("--tokens", type=int, nargs="+", required=True)
    parser.add_argument("--per-token", type=int, default=8)
    parser.add_argument("--out", default="patches.png")
    args = parser.parse_args()
    config = prepare(args)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    runner = build_runner(config, "validator")
    runner.init_state()
    if args.load_model_from:
        runner.load_model_from(args.load_model_from)
    model = runner.algorithm.model
    params = runner.state.params
    if "generator" in params:
        params = params["generator"]

    @jax.jit
    def tokenize(x):
        return model.apply(
            {"params": params}, x, method=model.encode_to_quant
        )

    collected: dict[int, list[np.ndarray]] = {t: [] for t in args.tokens}
    n_batches = len(runner.dataloader)
    if Store.DRY_RUN:
        n_batches = min(n_batches, 2)
    for bi, batch in enumerate(runner.dataloader):
        if bi >= n_batches or all(
            len(v) >= args.per_token for v in collected.values()
        ):
            break
        codes = np.asarray(tokenize(jnp.asarray(batch.image)))  # (B, h, w)
        b, h, w = codes.shape
        patch = batch.original_image.shape[1] // h
        for t in args.tokens:
            if len(collected[t]) >= args.per_token:
                continue
            ys, xs, zs = np.where(codes == t) if codes.ndim == 3 else ([], [], [])
            for img_i, py, px in zip(ys, xs, zs):
                if len(collected[t]) >= args.per_token:
                    break
                collected[t].append(
                    batch.original_image[
                        img_i,
                        py * patch: (py + 1) * patch,
                        px * patch: (px + 1) * patch,
                    ]
                )

    patch_size = max(
        (p.shape[0] for v in collected.values() for p in v), default=16
    )
    rows = []
    for t in args.tokens:
        patches = collected[t][: args.per_token]
        while len(patches) < args.per_token:
            patches.append(np.zeros((patch_size, patch_size, 3), np.uint8))
        rows.append(np.concatenate(patches, axis=1))
    grid = np.concatenate(rows, axis=0)
    Image.fromarray(grid).save(args.out)
    print(f"saved {args.out} ({len(args.tokens)} tokens)")


if __name__ == "__main__":
    main()
