"""Pallas TPU kernels for the DAMC hot loops."""

from .fused_langevin import ebm_params_to_dense_weights, fused_prior_langevin

__all__ = ["ebm_params_to_dense_weights", "fused_prior_langevin"]
