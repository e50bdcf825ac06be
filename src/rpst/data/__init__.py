from .datasets import (
    ImageFolderDataset,
    FlatFolderDataset,
    PairedDataset,
    PhotorealisticPairedDataset,
    IdentityDataset,
    FmtDataset,
    build_test_dataset,
)
from .cityscapes import CityscapesDataset, CITYSCAPES_LABEL_MAPPING
from .sampler import InfiniteSampler
from .loader import InfiniteLoader, iter_batches

__all__ = [
    "ImageFolderDataset", "FlatFolderDataset", "PairedDataset",
    "PhotorealisticPairedDataset", "IdentityDataset", "FmtDataset",
    "build_test_dataset", "CityscapesDataset", "CITYSCAPES_LABEL_MAPPING",
    "InfiniteSampler", "InfiniteLoader", "iter_batches",
]
