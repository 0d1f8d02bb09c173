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

import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np

logger = logging.getLogger("vector_quantization_tpu")

from .base import BaseDataset, Item, pixel_encode
from .native import AUGMENT_CODES, get_decoder

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
        native: bool = True,
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
        self.native = native
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

    def _item_seed(self, epoch: int, index: int) -> int:
        """Stable per-(seed, epoch, item) augmentation seed for the native
        decode path (splitmix-style mix; Python-side so resume at an epoch
        boundary reproduces the exact augmentation stream)."""
        z = (
            self.seed * 0x9E3779B97F4A7C15
            + epoch * 0xBF58476D1CE4E5B9
            + index * 0x94D049BB133111EB
            + 0xD6E8FEB86659FD93
        ) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        return (z ^ (z >> 31)) & 0xFFFFFFFFFFFFFFFF

    def _load_batch_native(self, idxs: list[int], epoch: int, decoder) -> Batch:
        """Native C++ decode for file-backed JPEG items, Python fallback for
        the rest (and for any native decode failure)."""
        ds = self.dataset
        records = [ds.native_record(i) for i in idxs]
        nat = [j for j, r in enumerate(records) if r is not None]
        items: list[Item | None] = [None] * len(idxs)
        if nat:
            imgs, ok = decoder.decode_batch(
                [records[j][0] for j in nat],
                ds.image_size,
                ds.transform.augmentation,
                [self._item_seed(epoch, idxs[j]) for j in nat],
            )
            for k, j in enumerate(nat):
                if ok[k]:
                    _, id_, category = records[j]
                    items[j] = Item(
                        id_=id_,
                        original_image=imgs[k],
                        image=pixel_encode(imgs[k]),
                        category=category,
                    )
        for j, it in enumerate(items):
            if it is None:
                items[j] = ds[idxs[j]]
        return _collate(items)

    def __iter__(self) -> Iterator[Batch]:
        batches = self._local_indices()
        epoch = self.epoch
        self.epoch += 1
        decoder = None
        if self.native and self.dataset.transform.augmentation in AUGMENT_CODES:
            decoder = get_decoder(self.num_workers or None)
        if (
            decoder is not None
            and len(self.dataset)
            and self.dataset.native_record(0) is None
        ):
            decoder = None  # not file-backed (e.g. synthetic): Python path
        if decoder is not None and self.epoch == 1:
            logger.info(
                "data: native decode plane active (%d threads)",
                decoder.num_threads,
            )
        if self.num_workers <= 0:
            for idxs in batches:
                if decoder is not None:
                    yield self._load_batch_native(idxs, epoch, decoder)
                else:
                    yield _collate([self.dataset[i] for i in idxs])
            return

        q: "queue.Queue[Any]" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce() -> None:
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        break
                    if decoder is not None:
                        q.put(self._load_batch_native(idxs, epoch, decoder))
                    else:
                        items = list(
                            pool.map(self.dataset.__getitem__, idxs)
                        )
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
