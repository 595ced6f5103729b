"""Generator model zoo: one parameterized deconv family + the toy MLP.

Replaces the five copy-pasted PyTorch classes `_netG_{cifar10,svhn,celeba64,
celebaHQ,mnist}` (`/root/reference/workspace/src/diffusion_net.py:20-203`)
with a single spec-driven Flax module. Layout is NHWC (TPU-native), latents
are flat (B, nz) vectors reshaped to (B, 1, 1, nz).

Spatial-shape parity with the torch stacks:
  * ConvTranspose(k, stride 1, torch pad 0)  -> flax padding='VALID'
  * ConvTranspose(4, stride 2, torch pad 1)  -> flax padding='SAME' (exact 2x)
  * ConvTranspose(3, stride 1, torch pad 1)  -> flax padding='SAME'
Spectral norm (`use_spc_norm`) is off at every reference call site and is
therefore not modeled.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import torch_bias_init, torch_kernel_init_transpose

# (features, kernel, stride, padding)
DeconvLayer = Tuple[int, int, int, str]


def generator_spec(dataset: str, ngf: int, nc: int) -> Tuple[DeconvLayer, ...]:
    """Per-dataset deconv stack (reference `diffusion_net.py:20-203`)."""
    if dataset == "cifar10":  # 1 -> 8 -> 16 -> 32 -> 32
        return (
            (ngf * 8, 8, 1, "VALID"),
            (ngf * 4, 4, 2, "SAME"),
            (ngf * 2, 4, 2, "SAME"),
            (nc, 3, 1, "SAME"),
        )
    if dataset == "svhn":  # 1 -> 4 -> 8 -> 16 -> 32
        return (
            (ngf * 8, 4, 1, "VALID"),
            (ngf * 4, 4, 2, "SAME"),
            (ngf * 2, 4, 2, "SAME"),
            (nc, 4, 2, "SAME"),
        )
    if dataset == "celeba64":  # 1 -> 4 -> 8 -> 16 -> 32 -> 64
        return (
            (ngf * 8, 4, 1, "VALID"),
            (ngf * 4, 4, 2, "SAME"),
            (ngf * 2, 4, 2, "SAME"),
            (ngf, 4, 2, "SAME"),
            (nc, 4, 2, "SAME"),
        )
    if dataset == "celebaHQ":  # 1 -> 4 -> ... -> 256
        return (
            (ngf * 16, 4, 1, "VALID"),
            (ngf * 8, 4, 2, "SAME"),
            (ngf * 4, 4, 2, "SAME"),
            (ngf * 4, 4, 2, "SAME"),
            (ngf * 2, 4, 2, "SAME"),
            (ngf, 4, 2, "SAME"),
            (nc, 4, 2, "SAME"),
        )
    if dataset == "mnist":  # 1 -> 7 -> 14 -> 28 -> 28
        return (
            (ngf * 8, 7, 1, "VALID"),
            (ngf * 4, 4, 2, "SAME"),
            (ngf * 2, 4, 2, "SAME"),
            (nc, 3, 1, "SAME"),
        )
    raise ValueError(f"unknown dataset {dataset!r}")


class DeconvGenerator(nn.Module):
    """G: z (B, nz) -> x (B, H, W, nc) in [-1, 1].

    LeakyReLU(0.2) between layers, Tanh at the output, torch-parity init.
    """

    layers: Sequence[DeconvLayer]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        b, nz = z.shape
        x = z.reshape(b, 1, 1, nz)
        n = len(self.layers)
        for i, (features, kernel, stride, padding) in enumerate(self.layers):
            x = nn.ConvTranspose(
                features=features,
                kernel_size=(kernel, kernel),
                strides=(stride, stride),
                padding=padding,
                kernel_init=torch_kernel_init_transpose,
                bias_init=torch_bias_init(features * kernel * kernel),
                dtype=self.dtype,
            )(x)
            if i < n - 1:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return jnp.tanh(x)


def make_generator(dataset: str, ngf: int, nc: int, dtype=jnp.float32) -> DeconvGenerator:
    return DeconvGenerator(layers=generator_spec(dataset, ngf, nc), dtype=dtype)


class ToyGenerator(nn.Module):
    """Frozen random MLP likelihood net for the 2-D toy experiment.

    2 -> 128 -> 128 -> 128 -> 2 with ReLU; weights ~ N(0, 0.2^2), biases
    ~ N(0, 0.1^2) (reference: `toy_example/toy_example.py:22-47`). Params are
    never trained — the toy workload treats G as a fixed ground-truth
    likelihood.
    """

    width: int = 128
    out_dim: int = 2

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        w_init = nn.initializers.normal(stddev=0.2)
        b_init = nn.initializers.normal(stddev=0.1)
        h = z
        for _ in range(3):
            h = nn.Dense(self.width, kernel_init=w_init, bias_init=b_init)(h)
            h = nn.relu(h)
        return nn.Dense(self.out_dim, kernel_init=w_init, bias_init=b_init)(h)
