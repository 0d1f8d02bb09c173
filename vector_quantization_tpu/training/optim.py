"""Optimizer + LR-schedule builders (optax).

Covers the reference's optimizer surface (SURVEY §6: Adam(β .5/.9) for
VQGAN G/D, AdamW cosine+warmup for VQ-KD/AR, plus todd's
``OptimizeCallback`` grad-clip) as declarative configs:

```python
optimizer = dict(type="adam", lr=5.4e-5, betas=(0.5, 0.9), grad_clip=1.0,
                 schedule=dict(type="cosine", warmup=25_000, total=250_000))
```

``exclude`` masks parameters out of the optimizer by path substring — the
functional version of the reference's non-gradient codebook (EMA-updated
quantizers freeze ``codebook`` here and update it explicitly in the train
step) and of ``FreezeMixin`` filters.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import optax

__all__ = ["build_optimizer", "build_schedule"]


def build_schedule(cfg: Mapping[str, Any] | float | None, lr: float):
    if cfg is None:
        return lr
    if isinstance(cfg, (int, float)):
        return float(cfg)
    kind = cfg.get("type", "constant")
    warmup = int(cfg.get("warmup", 0))
    total = int(cfg.get("total", 0))
    end = float(cfg.get("end", 0.0))
    if kind == "constant":
        sched = optax.constant_schedule(lr)
    elif kind == "cosine":
        sched = optax.cosine_decay_schedule(
            lr, max(total - warmup, 1), alpha=end / lr if lr else 0.0
        )
    elif kind == "linear":
        sched = optax.linear_schedule(lr, end, max(total - warmup, 1))
    else:
        raise ValueError(f"unknown schedule {kind!r}")
    if warmup:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), sched], [warmup]
        )
    return sched


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "idx", None)
        parts.append(str(key))
    return "/".join(parts)


def build_optimizer(
    cfg: Mapping[str, Any], params: Any | None = None
) -> optax.GradientTransformation:
    cfg = dict(cfg)
    kind = cfg.pop("type", "adam")
    lr = float(cfg.pop("lr", 1e-4))
    schedule = build_schedule(cfg.pop("schedule", None), lr)
    grad_clip = cfg.pop("grad_clip", None)
    exclude = cfg.pop("exclude", None)
    betas = cfg.pop("betas", None)
    if betas is not None:
        cfg["b1"], cfg["b2"] = betas

    if kind == "adam":
        tx = optax.adam(schedule, **cfg)
    elif kind == "adamw":
        tx = optax.adamw(schedule, **cfg)
    elif kind == "sgd":
        tx = optax.sgd(schedule, **cfg)
    elif kind == "lars":
        # reference: bespoke LARSOptimizer for the linear probe
        # (vq/tasks/image_classification/optimizers.py:14-63)
        tx = optax.lars(schedule, **cfg)
    else:
        raise ValueError(f"unknown optimizer {kind!r}")

    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)

    if exclude:
        if params is None:
            raise ValueError("exclude mask needs example params")
        # exclude accepts a substring, list of substrings, or a full
        # NamedParametersFilter spec dict (names/prefixes/suffixes/
        # contains/regexes — the reference's FreezeMixin filters)
        from ..utils.filters import mask_tree

        keep = mask_tree(params, exclude, value=False)
        drop = mask_tree(params, exclude, value=True)
        # optax.masked passes unmasked leaves' updates through UNCHANGED —
        # excluded leaves must be explicitly zeroed or the raw gradient
        # would be applied as the update
        tx = optax.chain(
            optax.masked(tx, keep),
            optax.masked(optax.set_to_zero(), drop),
        )
    return tx
