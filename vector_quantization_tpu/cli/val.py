"""``python -m vector_quantization_tpu.cli.val NAME CONFIG``

Continuous multi-checkpoint validation daemon (reference ``vq/val.py``,
SURVEY §3.2): watch the trainer's ``checkpoints/`` directory, validate each
new checkpoint with a fresh validator state, record metrics to the trainer's
TensorBoard under ``val/<metric>``, sleep (600 s; 10 s in DRY_RUN) when
drained.

Control-plane note: the reference broadcasts checkpoint names from rank 0
(``vq/val.py:69-77``); on TPU multi-host the checkpoint dir lives on a
shared filesystem (orbax requirement), so every host runs the identical
deterministic scan instead — no broadcast needed.
"""

from __future__ import annotations

import logging
import os
import time

from ..parallel.mesh import init_distributed, process_index
from ..training import checkpoints as ckpt
from ..training.runner import build_runner
from ..utils.flags import Store
from .common import build_parser, prepare

logger = logging.getLogger("vector_quantization_tpu")


class CheckpointMonitor:
    """Yields new checkpoint paths forever (reference MasterMonitor,
    vq/val.py:37-78)."""

    def __init__(
        self,
        checkpoint_dir: str,
        whitelist: list[str] | None = None,
        blacklist: list[str] | None = None,
        sleep_s: float | None = None,
        max_idle_rounds: int | None = None,
    ) -> None:
        self.checkpoint_dir = checkpoint_dir
        self.whitelist = whitelist
        self.blacklist = set(blacklist or [])
        self.sleep_s = sleep_s if sleep_s is not None else (
            10 if Store.DRY_RUN else 600
        )
        self.max_idle_rounds = max_idle_rounds
        self.seen: set[str] = set()

    def _scan(self) -> list[str]:
        if not os.path.isdir(self.checkpoint_dir):
            return []
        entries = [
            os.path.join(self.checkpoint_dir, n)
            for n in os.listdir(self.checkpoint_dir)
        ]
        entries = [
            p
            for p in entries
            if os.path.basename(p) not in self.blacklist
            and (
                self.whitelist is None
                or os.path.basename(p) in self.whitelist
            )
            and p not in self.seen
        ]
        return sorted(entries, key=os.path.getctime)

    def __iter__(self):
        idle = 0
        while True:
            fresh = self._scan()
            if not fresh:
                idle += 1
                if (
                    self.max_idle_rounds is not None
                    and idle >= self.max_idle_rounds
                ):
                    return
                logger.info("no new checkpoints; sleeping %ss", self.sleep_s)
                time.sleep(self.sleep_s)
                continue
            idle = 0
            for path in fresh:
                self.seen.add(path)
                yield path


def main(argv=None) -> None:
    parser = build_parser(__doc__)
    parser.add_argument("--max-idle-rounds", type=int, default=None)
    parser.add_argument(
        "--visual", default=None,
        help="regex over memo keys; matching images dump to work_dir/visuals",
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
    checkpoint_dir = os.path.join(validator.work_dir, "checkpoints")

    writer = None
    if process_index() == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(
                os.path.join(validator.work_dir, "tensorboard")
            )
        except ImportError:  # pragma: no cover
            pass

    monitor = CheckpointMonitor(
        checkpoint_dir,
        max_idle_rounds=args.max_idle_rounds
        or (1 if Store.DRY_RUN else None),
    )
    # --load-from restricts validation to named checkpoints (reference
    # vq.val --load-from iter_{15..26}0000 semantics; comma-separated here)
    whitelist = set(args.load_from.split(",")) if args.load_from else None
    for path in monitor:
        tag = os.path.basename(path)
        if whitelist is not None:
            if tag not in whitelist:
                continue
            whitelist.discard(tag)
        logger.info("validating %s", tag)
        validator.init_state()  # fresh state per checkpoint (vq/val.py:184)
        validator.resume(path)
        results = validator.run()
        step = int(tag.split("_")[-1]) if "_" in tag else 0
        if writer is not None:
            for k, v in results.items():
                writer.add_scalar(f"val/{k}", v, step)
            writer.flush()
        if whitelist is not None and not whitelist:
            break


if __name__ == "__main__":
    main()
