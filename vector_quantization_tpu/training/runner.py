"""Runners — host-side loops driving the jitted steps.

TPU-native analogue of todd's ``IterBasedTrainer``/``Validator``
(SURVEY §2.1; ``vq/runners/base.py:26-103``): a ``Trainer`` cycles the data
loader up to ``max_iters``, calling one pjit-compiled ``train_step`` per
iteration (all device work — fwd/bwd/optim/codebook updates/collectives —
is inside that one compiled function); a ``Validator`` runs the eval step
over its loader and feeds metric accumulators.
"""

from __future__ import annotations

import itertools
import logging
import os
from typing import Any, Iterable, Mapping, Sequence

import jax

from ..data.loader import DataLoader
from ..parallel.sharding import Strategy
from ..registries import (
    AlgorithmRegistry,
    CallbackRegistry,
    DatasetRegistry,
    MetricRegistry,
    RunnerRegistry,
    StrategyRegistry,
)
from . import checkpoints as ckpt
from .callbacks import BaseCallback
from .state import TrainState

__all__ = ["Trainer", "Validator", "build_runner"]

logger = logging.getLogger("vector_quantization_tpu")


def _device_batch(batch: Mapping[str, Any]) -> dict[str, Any]:
    """Strip host-only fields (string ids) before shipping to device."""
    return {k: v for k, v in batch.items() if k not in ("id_",)}


class _RunnerBase:
    def __init__(
        self,
        *,
        name: str,
        algorithm: Any,
        dataloader: DataLoader,
        strategy: Strategy,
        work_dir: str | None = None,
        callbacks: Sequence[BaseCallback] = (),
        seed: int = 3407,  # reference init_seed(3407), vq/train.py:34
    ) -> None:
        self.name = name
        self.algorithm = algorithm
        self.dataloader = dataloader
        self.strategy = strategy
        self.work_dir = work_dir or os.path.join("work_dirs", name)
        os.makedirs(self.work_dir, exist_ok=True)
        self.callbacks = list(callbacks)
        for cb in self.callbacks:
            cb.bind(self)
        self.seed = seed
        self.state: TrainState | None = None

    # -- state setup -------------------------------------------------------

    def init_state(self) -> TrainState:
        batch = _device_batch(next(iter(self.dataloader)))
        rng = jax.random.PRNGKey(self.seed)
        with jax.default_device(jax.devices()[0]):
            state = self.algorithm.init_state(rng, batch)
        # place every leaf according to the strategy (params + mirrored
        # optimizer moments get the same rule; path-aware for TP)
        shardings = self.strategy.state_sharding(state)
        self.state = jax.device_put(state, shardings)
        return self.state

    def save_checkpoint(self, step: int) -> None:
        path = ckpt.save_checkpoint(self.work_dir, self.state, step)
        logger.info("saved checkpoint %s", path)

    def load_model_from(self, paths: str | list[str]) -> None:
        if self.state is None:
            self.init_state()
        params = ckpt.load_model_from(paths, self.state.params)
        self.state = self.state.replace(params=params)

    def resume(self, path: str | None = None, auto: bool = False) -> bool:
        if self.state is None:
            self.init_state()
        if path is None and auto:
            path = ckpt.latest_checkpoint(self.work_dir)
        if path is None:
            return False
        self.state = ckpt.restore_checkpoint(path, self.state)
        logger.info("resumed from %s (step %d)", path, int(self.state.step))
        return True


@RunnerRegistry.register()
class Trainer(_RunnerBase):
    def __init__(self, *, max_iters: int, **kwargs: Any) -> None:
        super().__init__(**kwargs)
        from ..utils.flags import Store

        self.max_iters = 5 if Store.DRY_RUN else max_iters

    def _batches(self) -> Iterable[Mapping[str, Any]]:
        while True:
            yield from self.dataloader

    def _device_prefetch(self, batches, depth: int = 2):
        """Keep ``depth`` sharded batches in flight ahead of the consumer:
        the host→device upload of batch i+1 is issued (async) before the
        loop blocks on anything from step i, so transfer overlaps compute
        (the e2e input pipeline is transfer-bound on thin host links —
        BENCH_r04 dataplane)."""
        import collections

        pending: collections.deque = collections.deque()
        it = iter(batches)

        def enqueue(n: int) -> None:
            for batch in itertools.islice(it, n):
                pending.append(
                    self.strategy.shard_batch(_device_batch(batch))
                )

        enqueue(depth)
        while pending:
            out = pending.popleft()
            yield out
            enqueue(1)

    def run(self) -> TrainState:
        if self.state is None:
            self.init_state()
        step_fn = jax.jit(self.algorithm.train_step, donate_argnums=0)
        for cb in self.callbacks:
            cb.before_run()
        start = int(self.state.step)
        batches = itertools.islice(
            self._batches(), self.max_iters - start
        )
        for i, device_batch in enumerate(
            self._device_prefetch(batches), start=start + 1
        ):
            self.state, metrics = step_fn(self.state, device_batch)
            for cb in self.callbacks:
                cb.after_run_iter(i, metrics)
        for cb in self.callbacks:
            cb.after_run()
        return self.state


@RunnerRegistry.register()
class Validator(_RunnerBase):
    def __init__(
        self,
        *,
        metrics: Mapping[str, Any] | None = None,
        visual: Mapping[str, Any] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(**kwargs)
        self.metric_cfgs = dict(metrics or {})
        # visual dumps (reference Batched/UnbatchedVisualCallback,
        # vq/runners/callbacks/visual.py:26-121): keys regex-filtered,
        # 'batched' = one grid PNG per iter, 'unbatched' = one PNG per image
        self.visual = dict(visual) if visual else None
        self.max_iters = 0  # set per run

    def _dump_visuals(self, memo: Mapping[str, Any], batch, it: int) -> None:
        import re

        import numpy as np
        from PIL import Image

        from ..data.base import pixel_decode

        cfg = self.visual
        pattern = cfg.get("pattern")
        mode = cfg.get("mode", "unbatched")
        out_dir = os.path.join(self.work_dir, "visuals")
        os.makedirs(out_dir, exist_ok=True)
        for key in cfg.get("keys", ["pred"]):
            if pattern and not re.search(pattern, key):
                continue
            if key not in memo:
                continue
            imgs = np.asarray(pixel_decode(memo[key]))
            if mode == "batched":
                rows = np.concatenate(list(imgs), axis=1)  # horizontal strip
                Image.fromarray(rows).save(
                    os.path.join(out_dir, f"{key}_{it}.png")
                )
            else:
                for j, img in enumerate(imgs):
                    name = (
                        batch["id_"][j].replace("/", "_")
                        if "id_" in batch
                        else f"{it}_{j}"
                    )
                    Image.fromarray(img).save(
                        os.path.join(out_dir, f"{key}_{name}.png")
                    )

    def run(self, state: TrainState | None = None) -> dict[str, float]:
        from ..utils.flags import Store

        if state is not None:
            self.state = state
        elif self.state is None:
            self.init_state()
        metric_objs = {
            name: MetricRegistry.build(cfg, dataset=self.dataloader.dataset)
            for name, cfg in self.metric_cfgs.items()
        }
        eval_fn = jax.jit(self.algorithm.eval_step)
        n = len(self.dataloader)
        if Store.DRY_RUN:
            n = min(n, 2)
        self.max_iters = n
        for cb in self.callbacks:
            cb.before_run()
        from ..parallel.mesh import host_local_tree

        for i, batch in enumerate(itertools.islice(self.dataloader, n), 1):
            device_batch = self.strategy.shard_batch(_device_batch(batch))
            # metrics see this process's local rows (multi-host: global
            # arrays are not np.asarray-able; each host accumulates its
            # shard and summaries all-reduce — reference metrics.py:50-57)
            memo = host_local_tree(dict(eval_fn(self.state, device_batch)))
            memo["batch"] = batch
            for m in metric_objs.values():
                m.update(memo)
            if self.visual is not None:
                self._dump_visuals(memo, batch, i)
            for cb in self.callbacks:
                cb.after_run_iter(i, {})
        results: dict[str, float] = {}
        for name, m in metric_objs.items():
            results.update(m.summary(name))
        for cb in self.callbacks:
            cb.after_run()
        logger.info("validation[%s]: %s", self.name, results)
        return results


def build_runner(config: Mapping[str, Any], kind: str = "trainer") -> Any:
    """Assemble a runner from a config tree (the reference's
    ``VQRunnerRegistry.build(config.trainer)`` path, vq/train.py:39-45)."""
    cfg = dict(config[kind])
    mesh_axes = cfg.pop("mesh", None)
    from ..parallel.mesh import make_mesh

    mesh = make_mesh(mesh_axes)
    strategy_cfg = dict(cfg.pop("strategy", {"type": "DataParallelStrategy"}))
    strategy = StrategyRegistry.build(strategy_cfg, mesh=mesh)

    dataset = DatasetRegistry.build(cfg.pop("dataset"))
    loader_cfg = dict(cfg.pop("dataloader", {}))
    dataloader = DataLoader(dataset, **loader_cfg)

    algorithm = AlgorithmRegistry.build(cfg.pop("algorithm"))

    callbacks = [
        CallbackRegistry.build(c) for c in cfg.pop("callbacks", [])
    ]
    runner_type = cfg.pop(
        "type", "Trainer" if kind == "trainer" else "Validator"
    )
    return RunnerRegistry.build(
        {"type": runner_type, **cfg},
        algorithm=algorithm,
        dataloader=dataloader,
        strategy=strategy,
        callbacks=callbacks,
        name=config.get("name", kind),
    )
