"""Shared model utilities: PyTorch-compatible initializers and activations.

The reference relies on torch's default layer initialization (kaiming-uniform
with a=sqrt(5), which collapses to U(+-1/sqrt(fan_in)) for both kernel and
bias). Training dynamics of the alternating EBM/generator/amortizer loop are
sensitive to init scale, so we reproduce that distribution here rather than
using Flax's lecun_normal default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# U(+-sqrt(3 * (1/3) / fan_in)) == U(+-1/sqrt(fan_in)): torch's effective
# kernel init for Linear/Conv (kaiming_uniform with a=sqrt(5)).
torch_kernel_init = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)

# ConvTranspose kernels in torch compute fan from the output-channel axis.
torch_kernel_init_transpose = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_out", distribution="uniform"
)


def torch_bias_init(fan_in: int):
    """torch bias init: U(+-1/sqrt(fan_in)) with fan_in from the kernel."""

    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=negative_slope)


class TorchDense(nn.Module):
    """Dense layer with torch-default initialization."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
        )(x)
