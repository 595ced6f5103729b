"""Training layer: fused jitted train steps + state management."""

from .state import (
    DAMCState,
    ModelBundle,
    Optimizers,
    build_models,
    create_state,
    lr_schedule,
    make_optimizers,
)
from .step import make_train_step

__all__ = [
    "DAMCState",
    "ModelBundle",
    "Optimizers",
    "build_models",
    "create_state",
    "lr_schedule",
    "make_optimizers",
    "make_train_step",
]
