"""Concrete datasets.

Mirrors the reference's dataset zoo (``vq/datasets/``):
- ``ImageFolderDataset`` — any folder of images (vanilla.py:15-31), also the
  base for ImageNet-style layouts.
- ``ImageNetDataset`` — train/val with synset-directory categories
  (imagenet.py:15-27).
- ``SyntheticDataset`` — deterministic procedural images; the DRY_RUN/test/
  benchmark stand-in (the reference relies on real corpora + DRY_RUN
  shrinking; a synthetic source is the TPU-CI equivalent).
- ``ConcatDataset`` — concatenation with propagated metadata (concat.py:17-43).
- ``SplitDataset`` — deterministic val carve-out of a train corpus
  (split.py:18-58).
"""

from __future__ import annotations

import io
import os
from bisect import bisect_right
from typing import Sequence

import numpy as np

from ..registries import DatasetRegistry
from ..utils.flags import Store
from .base import BaseDataset, Item, pixel_encode

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

__all__ = [
    "ImageFolderDataset",
    "ImageNetDataset",
    "SyntheticDataset",
    "ConcatDataset",
    "SplitDataset",
]

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


@DatasetRegistry.register()
class ImageFolderDataset(BaseDataset):
    """Flat or nested folder of images; subdirectory = category when
    ``categorical=True``."""

    def __init__(
        self, *, root: str, categorical: bool = False, **kwargs
    ) -> None:
        self.root = root
        self.categorical = categorical
        paths: list[str] = []
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.lower().endswith(_EXTS):
                    paths.append(os.path.join(dirpath, f))
        if Store.DRY_RUN:
            paths = paths[:64]
        self.paths = paths
        categories = sorted({os.path.basename(os.path.dirname(p)) for p in paths})
        self.category_index = {c: i for i, c in enumerate(categories)}
        kwargs.setdefault(
            "num_categories", len(categories) if categorical else 0
        )
        super().__init__(**kwargs)

    def __len__(self) -> int:
        return len(self.paths)

    def _record(self, index: int) -> tuple[str, str, int]:
        path = self.paths[index]
        category = (
            self.category_index[os.path.basename(os.path.dirname(path))]
            if self.categorical
            else -1
        )
        id_ = os.path.splitext(os.path.relpath(path, self.root))[0]
        return path, id_, category

    def __getitem__(self, index: int) -> Item:
        path, id_, category = self._record(index)
        with Image.open(path) as img:
            img.load()
            return self._make_item(id_, img, category)

    def native_record(self, index: int) -> tuple[str, str, int] | None:
        path, id_, category = self._record(index)
        if not path.lower().endswith((".jpg", ".jpeg")):
            return None
        return path, id_, category


@DatasetRegistry.register()
class ImageNetDataset(ImageFolderDataset):
    """ImageNet directory layout: ``root/{split}/{synset}/*.JPEG``
    (reference imagenet.py:15-27; 1000 classes)."""

    def __init__(self, *, root: str, split: str = "train", **kwargs) -> None:
        kwargs.setdefault("name", f"imagenet_{split}")
        super().__init__(
            root=os.path.join(root, split), categorical=True, **kwargs
        )
        self.num_categories = kwargs.get("num_categories", 1000) or 1000


@DatasetRegistry.register()
class SyntheticDataset(BaseDataset):
    """Deterministic procedural RGB images (gradient + sinusoid textures),
    seeded per index — infinite-corpus stand-in for smoke runs and benches."""

    def __init__(
        self, *, size: int = 512, num_categories: int = 10, **kwargs
    ) -> None:
        kwargs.setdefault("name", "synthetic")
        kwargs.setdefault("num_categories", num_categories)
        super().__init__(**kwargs)
        self.size = 64 if Store.DRY_RUN and size > 64 else size

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index: int) -> Item:
        rng = np.random.default_rng(index)
        s = self.image_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        freqs = rng.uniform(1, 8, size=(3, 2))
        phases = rng.uniform(0, 2 * np.pi, size=3)
        chans = [
            0.5
            + 0.5 * np.sin(2 * np.pi * (f[0] * xx + f[1] * yy) + p)
            for f, p in zip(freqs, phases)
        ]
        img = np.stack(chans, axis=-1)
        img = (img * 255).astype(np.uint8)
        return Item(
            id_=f"synthetic/{index}",
            original_image=img,
            image=pixel_encode(img),
            category=int(index % max(self.num_categories, 1)),
        )


@DatasetRegistry.register()
class ConcatDataset(BaseDataset):
    """Concatenation with propagated name/num_categories/image_size
    (reference concat.py:17-43)."""

    def __init__(self, *, datasets: Sequence[BaseDataset], **kwargs) -> None:
        self.datasets = list(datasets)
        kwargs.setdefault(
            "name", "+".join(d.name for d in self.datasets)
        )
        kwargs.setdefault(
            "num_categories", max(d.num_categories for d in self.datasets)
        )
        kwargs.setdefault("image_size", self.datasets[0].image_size)
        super().__init__(**kwargs)
        self._offsets = np.cumsum([len(d) for d in self.datasets]).tolist()

    @classmethod
    def build_pre_hook(cls, config, registry):
        config["datasets"] = [
            registry.build_or_return(d) for d in config["datasets"]
        ]
        return config

    def __len__(self) -> int:
        return self._offsets[-1]

    def __getitem__(self, index: int) -> Item:
        ds_idx = bisect_right(self._offsets, index)
        prev = 0 if ds_idx == 0 else self._offsets[ds_idx - 1]
        return self.datasets[ds_idx][index - prev]

    def native_record(self, index: int) -> tuple[str, str, int] | None:
        ds_idx = bisect_right(self._offsets, index)
        prev = 0 if ds_idx == 0 else self._offsets[ds_idx - 1]
        return self.datasets[ds_idx].native_record(index - prev)


@DatasetRegistry.register()
class SplitDataset(BaseDataset):
    """Deterministic train/val carve-out of a single-corpus dataset
    (reference split.py:18-58: last ``val_size`` indices form the val split,
    optional strided interleave; DRY_RUN skips the carve-out)."""

    def __init__(
        self,
        *,
        dataset: BaseDataset,
        split: str = "train",
        val_size: int = 25_000,
        stride: int | None = None,
        **kwargs,
    ) -> None:
        self.dataset = dataset
        kwargs.setdefault("name", f"{dataset.name}_{split}")
        kwargs.setdefault("num_categories", dataset.num_categories)
        kwargs.setdefault("image_size", dataset.image_size)
        super().__init__(**kwargs)
        n = len(dataset)
        if Store.DRY_RUN:
            self.indices = list(range(n))
            return
        idx = np.arange(n)
        if stride:
            idx = idx.reshape(-1, stride).T.reshape(-1)
        if split == "train":
            self.indices = idx[: n - val_size].tolist()
        elif split == "val":
            self.indices = idx[n - val_size:].tolist()
        else:
            raise ValueError(split)

    @classmethod
    def build_pre_hook(cls, config, registry):
        config["dataset"] = registry.build_or_return(config["dataset"])
        return config

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, index: int) -> Item:
        return self.dataset[self.indices[index]]

    def native_record(self, index: int) -> tuple[str, str, int] | None:
        return self.dataset.native_record(self.indices[index])
