"""``python -m vector_quantization_tpu.cli.fid NAME CONFIG``

Build the FID reference cache for a dataset split (reference ``vq/fid.py``
+ ``FIDModel``/``FIDCallback``, ``vq/utils/fid.py:23-53``): run Inception
over the dataset's original images, save the (μ, Σ) statistics to
``--fid-path`` (or ``<work_dir>/<dataset>_fid.npz``).
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..data.loader import DataLoader
from ..models.metrics.fid import FIDStatistics
from ..parallel.mesh import init_distributed
from ..registries import DatasetRegistry
from ..utils.flags import Store
from .common import build_parser, parse_kv, prepare

logger = logging.getLogger("vector_quantization_tpu")


def main(argv=None) -> None:
    parser = build_parser(__doc__)
    parser.add_argument("--fid-path", default=None)
    parser.add_argument("--inception-weights", default=None)
    parser.add_argument("--split", default="validator")
    args = parser.parse_args(argv)
    init_distributed()
    config = prepare(args)

    import jax
    import jax.numpy as jnp

    from ..models.metrics.inception import InceptionV3Features

    dataset_cfg = config[args.split]["dataset"]
    dataset = DatasetRegistry.build(dataset_cfg)
    batch_size = config[args.split].get("fid_batch_size", 64)
    batch_size = max(1, min(batch_size, len(dataset)))
    loader = DataLoader(
        dataset, batch_size=batch_size, num_workers=8, drop_last=False,
    )

    model = InceptionV3Features()
    if args.inception_weights:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as saver:
            variables = saver.restore(args.inception_weights)
    else:
        logger.warning("no --inception-weights: using RANDOM inception init")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.uint8)
        )
    apply = jax.jit(lambda imgs: model.apply(variables, imgs))

    stats = FIDStatistics()
    n = len(loader)
    if Store.DRY_RUN:
        n = min(n, 2)
    for i, batch in enumerate(loader):
        if i >= n:
            break
        stats.update(np.asarray(apply(jnp.asarray(batch.original_image))))
        if i % 10 == 0:
            logger.info("fid cache: %d/%d batches", i, n)

    fid_path = args.fid_path or dataset.fid_path or os.path.join(
        "work_dirs", args.name, f"{dataset.name}_fid.npz"
    )
    os.makedirs(os.path.dirname(fid_path) or ".", exist_ok=True)
    stats.save(fid_path)
    logger.info("saved FID stats (n=%d) to %s", stats.n, fid_path)


if __name__ == "__main__":
    main()
