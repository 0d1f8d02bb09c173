"""Sharding strategies — the TPU replacement of todd's strategy layer.

Reference strategies (SURVEY §2.10, ``configs/strategies/*``):
``BaseStrategy``(CPU) / ``CUDAStrategy``(1 device) → single-device jit;
``DDPStrategy`` → batch sharded over the ``dp`` mesh axis, params replicated;
``FSDPStrategy`` → params additionally sharded over ``fsdp`` (ZeRO-style);
plus tensor parallelism (``tp``) for AR decoder weights — beyond the
reference, per the north star.

Under pjit/GSPMD there are no hand-written gradient all-reduces: annotating
the batch as dp-sharded and params as replicated makes XLA insert the
gradient psum; annotating params as fsdp-sharded makes it insert
all-gather/reduce-scatter. Codebook-stat collectives fall out the same way
(the histogram/centroid ops are written as global-batch computations).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..registries import StrategyRegistry

__all__ = [
    "Strategy",
    "SingleDeviceStrategy",
    "DataParallelStrategy",
    "FSDPStrategy",
    "TPStrategy",
    "batch_spec",
    "fsdp_param_spec",
]


def batch_spec(mesh: Mesh, batch_axes: tuple[str, ...] = ("dp", "fsdp")) -> P:
    """Batch dim sharded over every data-like mesh axis present."""
    axes = [a for a in batch_axes if a in mesh.axis_names]
    return P(tuple(axes)) if axes else P()


def fsdp_param_spec(
    path: tuple, leaf: jax.Array, mesh: Mesh, axis: str = "fsdp", min_size: int = 2**14
) -> P:
    """Shard the largest divisible dim of big params over ``axis``
    (ZeRO-3-style); small params stay replicated."""
    size = int(np.prod(leaf.shape)) if leaf.shape else 0
    n = mesh.shape[axis]
    if size < min_size:
        return P()
    dims = sorted(
        range(len(leaf.shape)), key=lambda i: leaf.shape[i], reverse=True
    )
    for d in dims:
        if leaf.shape[d] % n == 0:
            spec = [None] * len(leaf.shape)
            spec[d] = axis
            return P(*spec)
    return P()


class Strategy:
    """Builds shardings for params/opt-state/batch on its mesh."""

    def __init__(self, mesh: Mesh) -> None:
        self.mesh = mesh

    # -- interface ---------------------------------------------------------

    def leaf_sharding(self, path: tuple, leaf: Any) -> NamedSharding:
        """Sharding rule for one state/param leaf (path-aware so strategies
        like TP can match parameter names)."""
        return NamedSharding(self.mesh, P())

    def param_sharding(self, params: Any) -> Any:
        """Pytree of NamedSharding matching ``params``."""
        return jax.tree_util.tree_map_with_path(self.leaf_sharding, params)

    def state_sharding(self, state: Any) -> Any:
        """Shardings for a full TrainState (params + mirrored optimizer
        moments + extra); same rule tree-wide — optimizer state embeds the
        param tree so name-matching rules apply to moments too."""
        return jax.tree_util.tree_map_with_path(self.leaf_sharding, state)

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, batch_spec(self.mesh))

    # -- helpers -----------------------------------------------------------

    def shard_params(self, params: Any) -> Any:
        return jax.device_put(params, self.param_sharding(params))

    def shard_batch(self, batch: Any) -> Any:
        """Host-local numpy batch → globally sharded device arrays.

        Single-process: device_put with the batch sharding. Multi-host: each
        process contributes its local shard
        (``jax.make_array_from_process_local_data``).
        """
        sharding = self.batch_sharding()

        def put(x):
            x = np.asarray(x)
            if jax.process_count() > 1:
                return jax.make_array_from_process_local_data(sharding, x)
            return jax.device_put(x, sharding)

        return jax.tree_util.tree_map(put, batch)


@StrategyRegistry.register()
class SingleDeviceStrategy(Strategy):
    """reference BaseStrategy/CUDAStrategy: one device, no sharding."""

    def __init__(self, mesh: Mesh | None = None, device=None) -> None:
        if mesh is None:
            devs = [device or jax.devices()[0]]
            mesh = Mesh(np.asarray(devs), ("dp",))
        super().__init__(mesh)


@StrategyRegistry.register()
class DataParallelStrategy(Strategy):
    """reference DDPStrategy: batch over dp, params replicated."""


@StrategyRegistry.register()
class FSDPStrategy(Strategy):
    """reference FSDPStrategy: batch over all data axes, params sharded over
    the fsdp axis (falls back to dp when no fsdp axis is in the mesh)."""

    def __init__(self, mesh: Mesh, min_size: int = 2**14) -> None:
        super().__init__(mesh)
        self.min_size = min_size
        self.axis = "fsdp" if "fsdp" in mesh.axis_names else "dp"

    def leaf_sharding(self, path: tuple, leaf: Any) -> NamedSharding:
        return NamedSharding(
            self.mesh,
            fsdp_param_spec(path, leaf, self.mesh, self.axis, self.min_size),
        )


@StrategyRegistry.register()
class TPStrategy(Strategy):
    """First-class tensor parallelism for the AR transformer (the north-star
    sharding beyond the reference's DDP-only parallelism, SURVEY §2.10):
    Megatron-style column/row-parallel projections + vocab-sharded
    embeddings/lm_head over the ``tp`` mesh axis, batch over ``dp``.

    Rules come from :func:`..models.transformers.llama.llama_tp_param_spec`
    (name-matched, so they also hit the mirrored optimizer moments); a tp
    axis that does not divide the parameter dim falls back to replication
    (correctness is GSPMD-guaranteed either way — specs only choose layout).
    """

    def __init__(self, mesh: Mesh, rules: str = "llama") -> None:
        super().__init__(mesh)
        if "tp" not in mesh.axis_names:
            raise ValueError(
                f"TPStrategy needs a 'tp' mesh axis, got {mesh.axis_names}"
            )
        if rules != "llama":
            raise ValueError(f"unknown TP rule set {rules!r}")
        from ..models.transformers.llama import llama_tp_param_spec

        self._rule = llama_tp_param_spec

    def leaf_sharding(self, path: tuple, leaf: Any) -> NamedSharding:
        spec = self._rule(path, leaf)
        shape = getattr(leaf, "shape", ())
        n = self.mesh.shape["tp"]
        for i, axis in enumerate(spec):
            if axis == "tp" and (i >= len(shape) or shape[i] % n):
                return NamedSharding(self.mesh, P())
        return NamedSharding(self.mesh, spec)
