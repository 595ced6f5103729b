"""Latent-space energy-based model E: z -> R.

Reference: `_netE` MLP nz -> ndf -> ndf -> 1 with LeakyReLU(0.2)
(`/root/reference/workspace/src/diffusion_net.py:207-223`) and the wider
StyleGAN variant nz -> 512 -> 512 -> 512 -> 1
(`src/diffusion_net_stylegan.py:20-39`). One depth-parameterized module covers
both. Spectral norm is off at every reference call site.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import torch_bias_init, torch_kernel_init


class LatentEBM(nn.Module):
    """Energy head over latents; returns per-sample energies (B,)."""

    ndf: int = 200
    n_hidden: int = 2  # 2 for the image models, 3 for the StyleGAN variant
    nez: int = 1

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        h = z
        for _ in range(self.n_hidden):
            h = nn.Dense(
                self.ndf,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(h.shape[-1]),
            )(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dense(
            self.nez,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(h.shape[-1]),
        )(h)
        return jnp.squeeze(h, axis=-1) if self.nez == 1 else h
