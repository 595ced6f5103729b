"""Image -> embedding conv encoders for the DAMC amortizer.

One spec-driven module replaces `Encoder_{cifar10,celeba64,celebaHQ,mnist}`
(`/root/reference/workspace/src/diffusion_net.py:227-413`). Stacks are
Conv -> InstanceNorm(affine) -> LeakyReLU(0.2), closing with a VALID conv to
1x1 that is reshaped to the (B, nemb) embedding.

Padding parity with torch (NHWC here):
  * Conv(3, stride 1, pad 1)   -> 'SAME'
  * Conv(4, stride 2, pad 1)   -> explicit ((1, 1), (1, 1)) — NOT 'SAME':
    for odd inputs (MNIST 7 -> 3) SAME would pad (1, 2) and give 4.
  * Conv(k, stride 1, pad 0)   -> 'VALID'
InstanceNorm2d(affine=True) maps to GroupNorm with one group per channel.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import torch_bias_init, torch_kernel_init

# (features, kernel, stride, padding, normalize)
ConvLayer = Tuple[int, int, int, Union[str, int], bool]


def encoder_spec(dataset: str, nemb: int, nif: int) -> Tuple[ConvLayer, ...]:
    """Per-dataset conv stack (reference `diffusion_net.py:227-413`)."""
    if dataset in ("cifar10", "svhn"):  # 32 -> 32 -> 16 -> 8 -> 4 -> 1
        return (
            (nif, 3, 1, "SAME", True),
            (nif * 2, 4, 2, 1, True),
            (nif * 4, 4, 2, 1, True),
            (nif * 8, 4, 2, 1, True),
            (nemb, 4, 1, "VALID", False),
        )
    if dataset == "celeba64":  # 64 -> 64 -> 32 -> 16 -> 8 -> 4 -> 1
        return (
            (nif, 3, 1, "SAME", True),
            (nif * 2, 4, 2, 1, True),
            (nif * 4, 4, 2, 1, True),
            (nif * 8, 4, 2, 1, True),
            (nif * 8, 4, 2, 1, True),
            (nemb, 4, 1, "VALID", False),
        )
    if dataset == "celebaHQ":  # 256 -> 256 -> 128 -> 64 -> 32 -> 16 -> 8 -> 4 -> 1
        return (
            (nif, 3, 1, "SAME", True),
            (nif * 2, 4, 2, 1, True),
            (nif * 4, 4, 2, 1, True),
            (nif * 4, 4, 2, 1, True),
            (nif * 8, 4, 2, 1, True),
            (nif * 8, 4, 2, 1, True),
            (nif * 8, 4, 2, 1, True),
            (nemb, 4, 1, "VALID", False),
        )
    if dataset == "mnist":  # 28 -> 28 -> 14 -> 7 -> 3 -> 1
        return (
            (nif, 3, 1, "SAME", True),
            (nif * 2, 4, 2, 1, True),
            (nif * 4, 4, 2, 1, True),
            (nif * 8, 4, 2, 1, True),
            (nemb, 3, 1, "VALID", False),
        )
    raise ValueError(f"unknown dataset {dataset!r}")


class ConvEncoder(nn.Module):
    """x (B, H, W, C) -> embedding (B, nemb)."""

    layers: Sequence[ConvLayer]
    nemb: int
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = len(self.layers)
        for i, (features, kernel, stride, padding, normalize) in enumerate(self.layers):
            if isinstance(padding, int):
                padding = ((padding, padding), (padding, padding))
            fan_in = x.shape[-1] * kernel * kernel
            x = nn.Conv(
                features=features,
                kernel_size=(kernel, kernel),
                strides=(stride, stride),
                padding=padding,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(fan_in),
                dtype=self.dtype,
            )(x)
            if i < n - 1:
                if normalize and self.use_norm:
                    # InstanceNorm2d(affine=True): per-channel, per-sample
                    # normalization over the spatial dims (torch eps 1e-5).
                    x = nn.GroupNorm(
                        num_groups=None,
                        group_size=1,
                        epsilon=1e-5,
                        use_bias=True,
                        use_scale=True,
                        dtype=self.dtype,
                    )(x)
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x.reshape(x.shape[0], self.nemb)


def make_encoder(dataset: str, nemb: int, nif: int, dtype=jnp.float32) -> ConvEncoder:
    return ConvEncoder(layers=encoder_spec(dataset, nemb, nif), nemb=nemb, dtype=dtype)


class MLPEncoder(nn.Module):
    """Toy-experiment encoder: 2 -> 128 -> 128 -> 128 -> nemb with ReLU.

    Reference: `toy_example/src/diffusion_net.py:166-174`.
    """

    nemb: int
    width: int = 128
    depth: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        for _ in range(self.depth):
            h = nn.Dense(
                self.width,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(h.shape[-1]),
            )(h)
            h = nn.relu(h)
        return nn.Dense(
            self.nemb,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(h.shape[-1]),
        )(h)
