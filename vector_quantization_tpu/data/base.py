"""Dataset layer: items, pixel codec, transforms.

Behavioral reference: ``vq/datasets/base.py:16-72`` — items carry
``id_ / original_image (uint8) / image (normalized) / category``; the pixel
codec is ``encode = x/127.5 − 1`` and ``decode = clamp((x+1)·127.5) → uint8``.
Transforms mirror ``configs/datasets/transforms/``: 'none' = Resize shorter
side (bicubic) + CenterCrop; 'default' = RandomResizedCrop + HorizontalFlip.

Implementation is host-side numpy/PIL (the TPU never sees PIL); the loader
(:mod:`.loader`) shards globally and feeds device arrays.
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import Any, Iterator

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

__all__ = [
    "Item",
    "BaseDataset",
    "pixel_encode",
    "pixel_decode",
    "Transform",
]


def pixel_encode(x: np.ndarray) -> np.ndarray:
    """uint8 [0,255] → float32 [−1, 1] (reference base.py:64-67)."""
    return x.astype(np.float32) / 127.5 - 1.0


def pixel_decode(x) -> Any:
    """[−1, 1] → uint8 [0,255] (reference base.py:69-72). Works for numpy
    and jax arrays. Rounds to nearest (instead of the reference's truncating
    cast) so encode→decode is exactly lossless."""
    import jax.numpy as jnp

    if isinstance(x, np.ndarray):
        return np.clip(np.round((x + 1.0) * 127.5), 0, 255).astype(np.uint8)
    return jnp.clip(jnp.round((x + 1.0) * 127.5), 0, 255).astype(jnp.uint8)


@dataclasses.dataclass
class Item:
    id_: str
    original_image: np.ndarray  # (H, W, 3) uint8
    image: np.ndarray  # (H, W, 3) float32 in [-1, 1]
    category: int


class Transform:
    """'none' | 'default' (RandomResizedCrop+flip) — PIL-based, NHWC out."""

    def __init__(
        self,
        image_size: int,
        augmentation: str = "none",
        seed: int = 0,
    ) -> None:
        self.image_size = image_size
        self.augmentation = augmentation
        self.rng = np.random.default_rng(seed)

    def __call__(self, img: "Image.Image") -> np.ndarray:
        s = self.image_size
        if img.mode != "RGB":
            img = img.convert("RGB")
        if self.augmentation == "none":
            w, h = img.size
            scale = s / min(w, h)
            img = img.resize(
                (max(s, round(w * scale)), max(s, round(h * scale))),
                Image.BICUBIC,
            )
            w, h = img.size
            left, top = (w - s) // 2, (h - s) // 2
            img = img.crop((left, top, left + s, top + s))
        elif self.augmentation in ("default", "strong"):
            # RandomResizedCrop + flip; 'strong' narrows the crop scale to
            # (0.8, 1.0) (reference configs/datasets/transforms/strong.py)
            lo = 0.8 if self.augmentation == "strong" else 0.08
            w, h = img.size
            area = w * h
            for _ in range(10):
                target = area * self.rng.uniform(lo, 1.0)
                ar = np.exp(self.rng.uniform(np.log(3 / 4), np.log(4 / 3)))
                cw = int(round(np.sqrt(target * ar)))
                ch = int(round(np.sqrt(target / ar)))
                if 0 < cw <= w and 0 < ch <= h:
                    left = int(self.rng.integers(0, w - cw + 1))
                    top = int(self.rng.integers(0, h - ch + 1))
                    img = img.crop((left, top, left + cw, top + ch))
                    break
            img = img.resize((s, s), Image.BICUBIC)
            if self.rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        elif self.augmentation == "weak":
            # Resize shorter side + RandomCrop + flip (reference
            # configs/datasets/transforms/weak.py)
            w, h = img.size
            scale = s / min(w, h)
            img = img.resize(
                (max(s, round(w * scale)), max(s, round(h * scale))),
                Image.BICUBIC,
            )
            w, h = img.size
            left = int(self.rng.integers(0, w - s + 1))
            top = int(self.rng.integers(0, h - s + 1))
            img = img.crop((left, top, left + s, top + s))
            if self.rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            raise ValueError(f"unknown augmentation {self.augmentation!r}")
        return np.asarray(img, dtype=np.uint8)


class BaseDataset(ABC):
    """Map-style dataset (reference BaseMixin contract)."""

    def __init__(
        self,
        *,
        name: str,
        num_categories: int = 0,
        image_size: int = 256,
        fid_path: str | None = None,
        augmentation: str = "none",
        seed: int = 0,
    ) -> None:
        self.name = name
        self.num_categories = num_categories
        self.image_size = image_size
        self.fid_path = fid_path
        self.transform = Transform(image_size, augmentation, seed)

    @abstractmethod
    def __len__(self) -> int: ...

    @abstractmethod
    def __getitem__(self, index: int) -> Item: ...

    def native_record(self, index: int) -> tuple[str, str, int] | None:
        """(path, id_, category) for file-backed items, enabling the native
        C++ decode fast path (data/native.py); None = Python decode only."""
        return None

    def __iter__(self) -> Iterator[Item]:
        for i in range(len(self)):
            yield self[i]

    def _make_item(
        self, id_: str, img: "Image.Image", category: int = -1
    ) -> Item:
        original = self.transform(img)
        return Item(
            id_=id_,
            original_image=original,
            image=pixel_encode(original),
            category=category,
        )
