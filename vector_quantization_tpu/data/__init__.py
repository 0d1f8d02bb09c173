from .base import BaseDataset, Item, Transform, pixel_decode, pixel_encode
from .datasets import (
    ConcatDataset,
    ImageFolderDataset,
    ImageNetDataset,
    SplitDataset,
    SyntheticDataset,
)
from .domains import (
    COCODataset,
    LAIONAestheticsDataset,
    SAMed2DDataset,
    SATINDataset,
)
from .loader import Batch, DataLoader
