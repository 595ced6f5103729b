"""Data pipelines: toy pinwheel, MNIST anomaly splits, image datasets."""

from .pinwheel import sample_pinwheel

__all__ = ["sample_pinwheel"]
