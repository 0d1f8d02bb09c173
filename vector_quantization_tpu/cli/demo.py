"""``python -m vector_quantization_tpu.cli.demo NAME CONFIG --image PATH``

Single-image tokenize→reconstruct demo (reference
``vq/tasks/image_tokenization/demo.py:20-37`` with SingletonAccessLayer).
Writes ``<out>/reconstruction.png`` and prints the token grid.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..data.base import Transform, pixel_decode, pixel_encode
from ..training.runner import build_runner
from .common import build_parser, prepare

logger = logging.getLogger("vector_quantization_tpu")


def main(argv=None) -> None:
    parser = build_parser(__doc__)
    parser.add_argument("--image", required=True)
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)
    config = prepare(args)

    import jax.numpy as jnp
    from PIL import Image

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

    size = runner.dataloader.dataset.image_size
    with Image.open(args.image) as img:
        original = Transform(size)(img)
    x = jnp.asarray(pixel_encode(original))[None]

    codes = model.apply({"params": params}, x, method=model.encode_to_quant)
    print("token grid:")
    print(np.asarray(codes[0]))

    out_dir = args.output or os.path.join(runner.work_dir, "demo")
    os.makedirs(out_dir, exist_ok=True)
    if getattr(model, "decoder", None) is not None:
        recon = model.apply(
            {"params": params}, codes, method=model.decode_from_quant
        )
        recon_u8 = np.asarray(pixel_decode(recon[0]))
        Image.fromarray(recon_u8).save(
            os.path.join(out_dir, "reconstruction.png")
        )
        logger.info("wrote %s/reconstruction.png", out_dir)


if __name__ == "__main__":
    main()
