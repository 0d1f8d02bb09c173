"""Checkpointing — orbax-backed, with the reference's three load modes.

Reference semantics (SURVEY §5 checkpoint/resume; ``vq/train.py:23-25,47-48``,
``docs/training.md:35-44``):
- ``save`` every N iters into ``work_dir/checkpoints/iter_N``;
- ``--load-model-from A [B ...]`` — weights-only, multiple files merged in
  order (strict=False) — composing tokenizer+decoder+AR stacks;
- ``--load-from iter_N`` — full state resume (params+opt+step+extra);
- ``--auto-resume`` — resume from the latest checkpoint if any.

Sharded arrays round-trip through orbax with their NamedShardings.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp

from .state import TrainState

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "load_model_from",
    "latest_checkpoint",
    "list_checkpoints",
]


def _ckpt_dir(work_dir: str) -> str:
    return os.path.join(os.path.abspath(work_dir), "checkpoints")


def checkpoint_path(work_dir: str, step: int) -> str:
    return os.path.join(_ckpt_dir(work_dir), f"iter_{step}")


def list_checkpoints(work_dir: str) -> list[str]:
    d = _ckpt_dir(work_dir)
    if not os.path.isdir(d):
        return []
    entries = []
    for name in os.listdir(d):
        m = re.fullmatch(r"iter_(\d+)", name)
        if m:
            entries.append((int(m.group(1)), os.path.join(d, name)))
    return [p for _, p in sorted(entries)]


def latest_checkpoint(work_dir: str) -> str | None:
    ckpts = list_checkpoints(work_dir)
    return ckpts[-1] if ckpts else None


def save_checkpoint(work_dir: str, state: TrainState, step: int) -> str:
    path = checkpoint_path(work_dir, step)
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, dict(
            params=state.params,
            opt_state=state.opt_state,
            d_opt_state=state.d_opt_state,
            step=state.step,
            rng=state.rng,
            extra=dict(state.extra),
        ), force=True)
    return path


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Full resume: restore into the (possibly sharded) template state."""
    template = dict(
        params=state.params,
        opt_state=state.opt_state,
        d_opt_state=state.d_opt_state,
        step=state.step,
        rng=state.rng,
        extra=dict(state.extra),
    )
    with ocp.StandardCheckpointer() as saver:
        restored = saver.restore(os.path.abspath(path), template)
    return state.replace(**restored)


def _merge(dst: Any, src: Any) -> Any:
    """Recursive strict=False merge: src leaves override dst where paths
    match; unknown paths are ignored with a warning."""
    if isinstance(dst, dict) and isinstance(src, dict):
        out = dict(dst)
        for k, v in src.items():
            if k in out:
                out[k] = _merge(out[k], v)
            else:
                print(f"[load_model_from] ignoring unknown key {k!r}")
        return out
    return src


def merge_params(params: Any, src: Any) -> Any:
    """Public strict=False graft: merge ``src`` leaves over ``params`` and
    re-place the merged tree on the template's shardings (host numpy leaves
    would otherwise lose FSDP/TP placement — the reason ``load_model_from``
    re-device_puts)."""
    shardings = jax.tree_util.tree_map(
        lambda x: x.sharding if hasattr(x, "sharding") else None, params
    )
    merged = _merge(params, src)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if s is not None else x,
        merged,
        shardings,
    )


def load_model_from(paths: str | list[str], params: Any) -> Any:
    """Weights-only multi-file merge (reference strict=False semantics).

    Restores raw arrays, merges over the template, then re-places leaves on
    the template's shardings (so FSDP-sharded params stay sharded).
    """
    if isinstance(paths, str):
        paths = [paths]
    for path in paths:
        with ocp.StandardCheckpointer() as saver:
            restored = saver.restore(os.path.abspath(path))
        src = restored.get("params", restored)
        params = merge_params(params, src)
    return params
