"""Runner callbacks — logging, checkpointing, TensorBoard, git snapshot.

Covers the todd runner-callback surface the reference wires in
(SURVEY §2.1: ``OptimizeCallback`` is folded into the jitted step;
``LRScheduleCallback`` into the optax schedule; the host-side ones live
here): ``LogCallback`` (interval logging + EMA-smoothed ETA),
``CheckpointCallback`` (interval saves), ``TensorBoardCallback``,
``GitCallback`` (records ``git diff HEAD`` for reproducibility).
"""

from __future__ import annotations

import logging
import os
import subprocess
import time
from typing import Any, Mapping

import numpy as np

from ..registries import CallbackRegistry

__all__ = [
    "BaseCallback",
    "LogCallback",
    "CheckpointCallback",
    "TensorBoardCallback",
    "GitCallback",
]

logger = logging.getLogger("vector_quantization_tpu")


class BaseCallback:
    def bind(self, runner: Any) -> None:
        self.runner = runner

    def before_run(self) -> None: ...

    def after_run_iter(self, step: int, metrics: Mapping[str, Any]) -> None: ...

    def after_run(self) -> None: ...


@CallbackRegistry.register()
class LogCallback(BaseCallback):
    """Prints ``Iter [i/N] ETA ... k=v ...`` at intervals with EMA-smoothed
    iteration time (reference LogCallback format, parsed by
    ``tools/convert_log_to_tensorboard.py:36-50``)."""

    def __init__(self, interval: int = 50, ema: float = 0.9) -> None:
        self.interval = interval
        self.ema = ema
        self._t = None
        self._iter_time = None

    def before_run(self) -> None:
        self._t = time.perf_counter()

    def after_run_iter(self, step: int, metrics: Mapping[str, Any]) -> None:
        now = time.perf_counter()
        dt = now - self._t
        self._t = now
        self._iter_time = (
            dt
            if self._iter_time is None
            else self.ema * self._iter_time + (1 - self.ema) * dt
        )
        if step % self.interval and step != self.runner.max_iters:
            return
        remaining = (self.runner.max_iters - step) * self._iter_time
        eta = time.strftime("%H:%M:%S", time.gmtime(max(remaining, 0)))
        kv = " ".join(
            f"{k}={float(np.asarray(v)):.4g}"
            for k, v in metrics.items()
            if np.asarray(v).ndim == 0
        )
        logger.info(
            "Iter [%d/%d] ETA %s %s", step, self.runner.max_iters, eta, kv
        )


@CallbackRegistry.register()
class CheckpointCallback(BaseCallback):
    """Save every ``interval`` iters (reference: 1e4 —
    configs/vqgan/runner.py:41)."""

    def __init__(self, interval: int = 10_000, save_last: bool = True) -> None:
        self.interval = interval
        self.save_last = save_last

    def after_run_iter(self, step: int, metrics: Mapping[str, Any]) -> None:
        if step % self.interval == 0 or (
            self.save_last and step == self.runner.max_iters
        ):
            self.runner.save_checkpoint(step)


@CallbackRegistry.register()
class TensorBoardCallback(BaseCallback):
    def __init__(self, interval: int = 50, tag: str = "train") -> None:
        self.interval = interval
        self.tag = tag
        self._writer = None

    def before_run(self) -> None:
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(
                os.path.join(self.runner.work_dir, "tensorboard")
            )
        except ImportError:  # pragma: no cover
            logger.warning("tensorboard unavailable; skipping")

    def after_run_iter(self, step: int, metrics: Mapping[str, Any]) -> None:
        if self._writer is None or step % self.interval:
            return
        for k, v in metrics.items():
            v = np.asarray(v)
            if v.ndim == 0:
                self._writer.add_scalar(f"{self.tag}/{k}", float(v), step)

    def after_run(self) -> None:
        if self._writer is not None:
            self._writer.close()


@CallbackRegistry.register()
class ProfileCallback(BaseCallback):
    """Capture a jax.profiler trace for steps [start, start+steps)
    (SURVEY §5 tracing — the TPU answer to the reference's interval logs)."""

    def __init__(self, start: int = 10, steps: int = 5) -> None:
        self.start = start
        self.steps = steps
        self._active = False

    def after_run_iter(self, step: int, metrics: Mapping[str, Any]) -> None:
        import jax

        if step == self.start and not self._active:
            jax.profiler.start_trace(
                os.path.join(self.runner.work_dir, "profile")
            )
            self._active = True
        elif self._active and step >= self.start + self.steps:
            jax.profiler.stop_trace()
            self._active = False
            logger.info(
                "profiler trace written to %s/profile", self.runner.work_dir
            )

    def after_run(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


@CallbackRegistry.register()
class SyncCheckCallback(BaseCallback):
    """DRY_RUN/DEBUG race detector: assert the codebook is replicated
    bit-identically across devices after each step (reference ``is_sync``
    asserts before codebook writes)."""

    def __init__(self, path: tuple[str, ...] | None = None) -> None:
        self.path = tuple(path) if path else None

    def after_run_iter(self, step: int, metrics: Mapping[str, Any]) -> None:
        from ..utils.debug import assert_replicated

        state = self.runner.state
        node = state.params
        path = self.path or getattr(
            self.runner.algorithm, "codebook_path", None
        )
        if path is None:
            return
        try:
            for k in path:
                node = node[k]
        except (KeyError, TypeError):
            return
        assert_replicated(node, "/".join(path))


@CallbackRegistry.register()
class GitCallback(BaseCallback):
    """Record ``git diff HEAD`` into the work dir (reference GitCallback)."""

    def before_run(self) -> None:
        try:
            diff = subprocess.run(
                ["git", "diff", "HEAD"],
                capture_output=True,
                text=True,
                timeout=30,
                check=False,
            ).stdout
            with open(os.path.join(self.runner.work_dir, "git.diff"), "w") as f:
                f.write(diff)
        except Exception as e:  # pragma: no cover
            logger.warning("git snapshot failed: %s", e)
