"""``python -m vector_quantization_tpu.cli.test NAME CONFIG --load-model-from CKPT``

Single-checkpoint validation (reference ``vq/test.py:15-48``).
"""

from __future__ import annotations

import json

from ..parallel.mesh import init_distributed
from ..training.runner import build_runner
from .common import build_parser, log_run, prepare


def main(argv=None) -> None:
    parser = build_parser(__doc__)
    parser.add_argument(
        "--visual", default=None,
        help="regex over memo keys; matching images dump to work_dir/visuals"
        " (reference --visual, vq/runners/base.py:66-103)",
    )
    args = parser.parse_args(argv)
    init_distributed()
    config = prepare(args)
    validator = build_runner(config, "validator")
    if args.visual:
        validator.visual = {
            "pattern": args.visual,
            "keys": ["pred", "generated_image", "half_generated"],
            **(validator.visual or {}),
        }
    if args.work_dir:
        validator.work_dir = args.work_dir
    log_run(validator.work_dir, config)
    validator.init_state()
    if args.load_model_from:
        validator.load_model_from(args.load_model_from)
    results = validator.run()
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
