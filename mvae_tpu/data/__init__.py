"""Data layer (L6): datasets with dynamic binarization, TPU-resident feed."""
from .base import ArrayDataset, binarize_batch, to_device_dataset
from .loaders import generate_bdp, load_cifar, load_dataset, load_mnist, load_omniglot

__all__ = ["ArrayDataset", "binarize_batch", "to_device_dataset",
           "load_dataset", "load_mnist", "load_omniglot", "load_cifar",
           "generate_bdp"]
