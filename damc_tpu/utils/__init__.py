"""Config, logging, checkpoint utilities."""

from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .logging import MetricsLogger, save_image_grid, save_kde_plot
from .placement import cast_float_leaves, device_put_packed
from .config import (
    Config,
    DiffusionConfig,
    MCMCConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    preset,
)

__all__ = [
    "cast_float_leaves",
    "device_put_packed",
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
    "MetricsLogger",
    "save_image_grid",
    "save_kde_plot",
    "Config",
    "DiffusionConfig",
    "MCMCConfig",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "preset",
]
