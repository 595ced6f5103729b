"""Config, logging, checkpoint utilities."""

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
    "Config",
    "DiffusionConfig",
    "MCMCConfig",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "preset",
]
