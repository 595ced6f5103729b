"""Data pipelines: toy pinwheel, MNIST anomaly splits, image datasets."""

from .device_data import DeviceDataset, fits_device
from .pinwheel import sample_pinwheel

__all__ = ["DeviceDataset", "fits_device", "sample_pinwheel"]
