"""Pure-function compute kernels: diffusion math, Langevin MCMC, reverse sweep."""

from .diffusion import (
    Gaussian,
    denoise_true,
    diffusion_forward,
    diffusion_reverse,
    log1mexp,
    logsnr_schedule,
    pred_x_from_eps,
)
from .langevin import (
    LangevinDiagnostics,
    adam_latent_descent,
    gaussian_posterior_energy,
    langevin_sample,
    posterior_energy,
    prior_energy,
    prior_langevin_auto,
)
from .reverse_diffusion import reverse_diffusion_sample

__all__ = [
    "Gaussian",
    "denoise_true",
    "diffusion_forward",
    "diffusion_reverse",
    "log1mexp",
    "logsnr_schedule",
    "pred_x_from_eps",
    "LangevinDiagnostics",
    "adam_latent_descent",
    "gaussian_posterior_energy",
    "langevin_sample",
    "posterior_energy",
    "prior_energy",
    "prior_langevin_auto",
    "reverse_diffusion_sample",
]
