"""Domain datasets: LAION-Aesthetics, COCO, SA-Med2D, SATIN.

Behavioral reference: ``vq/datasets/{laion_aesthetics,coco,sa_med2d,satin}.py``
— thin wrappers over folder corpora (category fixed to 0; the reference gets
the file lists from todd access layers). LAION adds the deterministic
train/val carve-out (SplitMixin) and a retry-with-random-reindex guard
around flaky decodes (``laion_aesthetics.py:25-37``).
"""

from __future__ import annotations

import random

from ..registries import DatasetRegistry
from .base import Item
from .datasets import ImageFolderDataset, SplitDataset

__all__ = [
    "LAIONAestheticsDataset",
    "COCODataset",
    "SAMed2DDataset",
    "SATINDataset",
]


@DatasetRegistry.register()
class COCODataset(ImageFolderDataset):
    """COCO images (``root/<split>2014|2017/*.jpg``); category = 0."""

    def __init__(self, *, root: str, split: str = "train2014", **kwargs):
        kwargs.setdefault("name", f"coco_{split}")
        import os

        super().__init__(root=os.path.join(root, split), **kwargs)


@DatasetRegistry.register()
class SAMed2DDataset(ImageFolderDataset):
    """SA-Med2D-20M medical images; category = 0."""

    def __init__(self, *, root: str, **kwargs):
        kwargs.setdefault("name", "sa_med2d")
        super().__init__(root=root, **kwargs)


@DatasetRegistry.register()
class SATINDataset(ImageFolderDataset):
    """SATIN satellite imagery; category = 0."""

    def __init__(self, *, root: str, **kwargs):
        kwargs.setdefault("name", "satin")
        super().__init__(root=root, **kwargs)


@DatasetRegistry.register()
class LAIONAestheticsDataset(SplitDataset):
    """LAION-Aesthetics folder corpus with the deterministic val carve-out
    and decode-retry (10 attempts, random re-index after the first)."""

    def __init__(
        self,
        *,
        root: str,
        split: str = "train",
        val_size: int = 25_000,
        retries: int = 10,
        **kwargs,
    ):
        base = ImageFolderDataset(
            root=root,
            name="laion_aesthetics",
            image_size=kwargs.get("image_size", 256),
        )
        kwargs.setdefault("name", f"laion_aesthetics_{split}")
        super().__init__(
            dataset=base, split=split, val_size=val_size, **kwargs
        )
        self.retries = retries

    def __getitem__(self, index: int) -> Item:
        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                return super().__getitem__(index)
            except Exception as e:  # noqa: BLE001 - flaky decode guard
                last = e
                index = random.randint(0, len(self) - 1)  # nosec B311
        raise last  # type: ignore[misc]
