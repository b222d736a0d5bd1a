from .imagelist import (DataLoader, DevicePrefetcher, ImageList,
                        default_list_reader, pil_loader)
from .synthetic import SyntheticImages, synthetic_loader
from .transforms import (IMAGENET_MEAN, IMAGENET_STD, train_transform,
                         val_transform)

__all__ = [
    "DataLoader", "DevicePrefetcher", "ImageList", "default_list_reader",
    "pil_loader", "SyntheticImages", "synthetic_loader", "IMAGENET_MEAN",
    "IMAGENET_STD", "train_transform", "val_transform",
]
