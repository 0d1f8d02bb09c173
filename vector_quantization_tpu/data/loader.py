"""Batched, sharded, prefetching data loader.

Replaces the reference's ``DistributedSampler`` + torch DataLoader with
``batch_size_in_total`` global-batch semantics (SURVEY §2.1:
``configs/strategies/cuda.py:1-8``, ``configs/datasets/batch_size_in_total.py``):
the *global* batch is split evenly across processes; each host loads only its
shard and the device mesh sees per-host arrays that ``jax.make_array_from_
process_local_data`` can assemble into a globally-sharded batch.

Thread-pool prefetch keeps PIL decode off the critical path.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np

from .base import BaseDataset, Item

__all__ = ["Batch", "DataLoader"]


class Batch(dict):
    """dict with attribute access: id_ (list[str]), original_image (uint8
    B,H,W,3), image (float32 B,H,W,3 in [-1,1]), category (int32 B,)."""

    __getattr__ = dict.__getitem__


def _collate(items: list[Item]) -> Batch:
    return Batch(
        id_=[it.id_ for it in items],
        original_image=np.stack([it.original_image for it in items]),
        image=np.stack([it.image for it in items]),
        category=np.asarray([it.category for it in items], np.int32),
    )


class DataLoader:
    def __init__(
        self,
        dataset: BaseDataset,
        *,
        batch_size_in_total: int | None = None,
        batch_size: int | None = None,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        num_processes: int | None = None,
        process_index: int | None = None,
    ) -> None:
        import jax

        self.dataset = dataset
        self.num_processes = (
            jax.process_count() if num_processes is None else num_processes
        )
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        if batch_size_in_total is not None:
            if batch_size_in_total % self.num_processes:
                raise ValueError(
                    f"global batch {batch_size_in_total} not divisible by "
                    f"{self.num_processes} processes"
                )
            self.batch_size = batch_size_in_total // self.num_processes
        elif batch_size is not None:
            self.batch_size = batch_size
        else:
            raise ValueError("need batch_size or batch_size_in_total")
        self.global_batch_size = self.batch_size * self.num_processes
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset) // self.global_batch_size
        if not self.drop_last and len(self.dataset) % self.global_batch_size:
            n += 1
        return n

    def _local_indices(self) -> list[list[int]]:
        """Per-batch index lists for THIS process (global batch sharding)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        batches = []
        for start in range(0, n, self.global_batch_size):
            chunk = order[start: start + self.global_batch_size]
            if len(chunk) < self.global_batch_size:
                if self.drop_last:
                    break
                # pad by wrapping (keeps static shapes for jit)
                chunk = np.concatenate(
                    [chunk, order[: self.global_batch_size - len(chunk)]]
                )
            local = chunk[
                self.process_index * self.batch_size:
                (self.process_index + 1) * self.batch_size
            ]
            batches.append(local.tolist())
        return batches

    def __iter__(self) -> Iterator[Batch]:
        batches = self._local_indices()
        self.epoch += 1
        if self.num_workers <= 0:
            for idxs in batches:
                yield _collate([self.dataset[i] for i in idxs])
            return

        q: "queue.Queue[Any]" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce() -> None:
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        break
                    items = list(pool.map(self.dataset.__getitem__, idxs))
                    q.put(_collate(items))
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
