#!/usr/bin/env python
"""Offline FID of a folder of images vs cached statistics (or a second
folder). Appends the result to ``fid.txt`` like the reference
(``tools/fid.py:28-86``).

    python tools/fid.py --pred work_dirs/x/visuals --stats data/val_fid.npz
    python tools/fid.py --pred DIR_A --gt DIR_B [--inception-weights CKPT]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def folder_stats(path, apply, batch_size, image_size):
    from PIL import Image

    import jax.numpy as jnp

    from vector_quantization_tpu.data.base import Transform
    from vector_quantization_tpu.models.metrics.fid import FIDStatistics

    transform = Transform(image_size)
    stats = FIDStatistics()
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    for start in range(0, len(files), batch_size):
        imgs = []
        for f in files[start:start + batch_size]:
            with Image.open(f) as img:
                imgs.append(transform(img))
        batch = jnp.asarray(np.stack(imgs))
        stats.update(np.asarray(apply(batch)))
    return stats


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pred", required=True)
    p.add_argument("--gt", default=None)
    p.add_argument("--stats", default=None)
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--out", default="fid.txt")
    args = p.parse_args()
    assert args.gt or args.stats, "need --gt folder or --stats npz"

    import jax
    import jax.numpy as jnp

    from vector_quantization_tpu.models.metrics.fid import (
        FIDStatistics,
        frechet_distance,
    )
    from vector_quantization_tpu.models.metrics.inception import (
        InceptionV3Features,
    )

    model = InceptionV3Features()
    if args.inception_weights:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as saver:
            variables = saver.restore(os.path.abspath(args.inception_weights))
    else:
        print("WARNING: random inception init (no --inception-weights)")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.uint8)
        )
    apply = jax.jit(lambda x: model.apply(variables, x))

    pred = folder_stats(args.pred, apply, args.batch_size, args.image_size)
    if args.stats:
        gt = FIDStatistics.load(args.stats)
    else:
        gt = folder_stats(args.gt, apply, args.batch_size, args.image_size)
    fid = frechet_distance(gt.mean, gt.cov, pred.mean, pred.cov)
    line = f"{args.pred}: FID={fid:.4f} (n={pred.n})"
    print(line)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
