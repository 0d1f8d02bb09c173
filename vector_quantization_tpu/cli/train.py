"""``python -m vector_quantization_tpu.cli.train NAME CONFIG [...]``

Reference: ``vq/train.py`` (SURVEY §3.1). Multi-host: set
JAX_NUM_PROCESSES / coordinator env and run once per host
(replaces auto_torchrun).
"""

from __future__ import annotations

from ..parallel.mesh import init_distributed
from ..training.runner import build_runner
from .common import build_parser, log_run, prepare


def main(argv=None) -> None:
    args = build_parser(__doc__).parse_args(argv)
    init_distributed()
    config = prepare(args)
    trainer = build_runner(config, "trainer")
    if args.work_dir:
        trainer.work_dir = args.work_dir
    log_run(trainer.work_dir, config)
    trainer.init_state()
    if args.load_model_from:
        trainer.load_model_from(args.load_model_from)
    if args.load_from or args.auto_resume:
        trainer.resume(args.load_from, auto=args.auto_resume)
    trainer.run()


if __name__ == "__main__":
    main()
