"""Flax model zoo for DAMC: generators, EBM, encoders, denoiser, amortizer."""

from .amortizer import (
    DAMCAmortizer,
    PriorEmbedder,
    sample_q,
    sample_q_per_item,
)
from .denoiser import ConcatSquashLinear, LatentDenoiser, SinusoidalTimeEmbedding
from .ebm import LatentEBM
from .encoders import ConvEncoder, MLPEncoder, encoder_spec, make_encoder
from .generators import DeconvGenerator, ToyGenerator, generator_spec, make_generator

__all__ = [
    "DAMCAmortizer",
    "PriorEmbedder",
    "sample_q",
    "sample_q_per_item",
    "ConcatSquashLinear",
    "LatentDenoiser",
    "SinusoidalTimeEmbedding",
    "LatentEBM",
    "ConvEncoder",
    "MLPEncoder",
    "encoder_spec",
    "make_encoder",
    "DeconvGenerator",
    "ToyGenerator",
    "generator_spec",
    "make_generator",
]
