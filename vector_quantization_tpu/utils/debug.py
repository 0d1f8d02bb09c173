"""Debug utilities — cross-device sync asserts and profiling.

Reference: todd's ``is_sync`` DRY_RUN asserts guarding direct codebook
writes (``vq/algorithms/vq/callbacks/update.py:53-55``, SURVEY §4.3 "a
poor-man's race detector"), and SURVEY §5 tracing (jax.profiler here).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from .flags import Store

__all__ = ["assert_replicated", "trace"]


def assert_replicated(x: jax.Array, name: str = "array") -> None:
    """Assert a supposedly-replicated array is bit-identical on every device
    holding it (the codebook-sync invariant). Active when DEBUG/DRY_RUN."""
    if not (Store.DEBUG or Store.DRY_RUN):
        return
    if not hasattr(x, "addressable_shards"):
        return
    shards = x.addressable_shards
    if len(shards) <= 1:
        return
    ref = None
    for shard in shards:
        if shard.index != shards[0].index:
            continue  # only compare replicas of the same slice
        data = np.asarray(shard.data)
        if ref is None:
            ref = data
        elif not np.array_equal(ref, data):
            raise AssertionError(
                f"{name} diverged across devices (replica mismatch on "
                f"device {shard.device})"
            )


class trace:
    """``with trace('dir'):`` — jax.profiler trace context (set
    ``trace(None)`` to no-op)."""

    def __init__(self, log_dir: str | None) -> None:
        self.log_dir = log_dir

    def __enter__(self):
        if self.log_dir:
            jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc: Any):
        if self.log_dir:
            jax.profiler.stop_trace()
        return False
