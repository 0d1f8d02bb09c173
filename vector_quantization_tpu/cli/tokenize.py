"""``python -m vector_quantization_tpu.cli.tokenize NAME CONFIG [--train]``

Corpus tokenization (reference ``vq/tasks/image_tokenization/tokenize.py``
+ ``Tokenizer`` runner + ``TokenizeCallback``, SURVEY §3.4): run only
``encode_to_quant`` (no decode) over a dataset and save
``{id_, category, tokens}`` per batch per process to
``<work_dir>/tokens/<iter>_<process>.npz``.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..parallel.mesh import init_distributed, process_index
from ..training.runner import build_runner
from ..utils.flags import Store
from .common import build_parser, prepare

logger = logging.getLogger("vector_quantization_tpu")


def main(argv=None) -> None:
    parser = build_parser(__doc__)
    parser.add_argument(
        "--train", action="store_true",
        help="tokenize the trainer split instead of the validator split",
    )
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)
    init_distributed()
    config = prepare(args)

    import jax
    import jax.numpy as jnp

    split = "trainer" if args.train else "validator"
    # build the validator runner but swap in the requested dataset
    # (reference tokenize.py:29-44)
    cfg = config.copy()
    if args.train:
        cfg["validator"]["dataset"] = config["trainer"]["dataset"]
    runner = build_runner(cfg, "validator")
    if args.work_dir:
        runner.work_dir = args.work_dir
    runner.init_state()
    if args.load_model_from:
        runner.load_model_from(args.load_model_from)

    algo = runner.algorithm
    model = algo.model

    @jax.jit
    def tokenize(state, image):
        params = state.params
        if "generator" in params:  # GAN algorithms split the params tree
            params = params["generator"]
        return model.apply(
            {"params": params}, image, method=model.encode_to_quant
        )

    out_dir = args.output or os.path.join(runner.work_dir, "tokens")
    os.makedirs(out_dir, exist_ok=True)
    rank = process_index()
    n = len(runner.dataloader)
    if Store.DRY_RUN:
        n = min(n, 2)
    for i, batch in enumerate(runner.dataloader):
        if i >= n:
            break
        codes = tokenize(runner.state, jnp.asarray(batch.image))
        np.savez(
            os.path.join(out_dir, f"{i}_{rank}.npz"),
            id_=np.asarray(batch.id_),
            category=batch.category,
            tokens=np.asarray(codes),
        )
        if i % 20 == 0:
            logger.info("tokenized %d/%d batches", i, n)
    logger.info("tokens written to %s", out_dir)


if __name__ == "__main__":
    main()
