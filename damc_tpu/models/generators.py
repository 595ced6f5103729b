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

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes
from jax import lax

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


class PhaseConvTranspose(nn.Module):
    """`nn.ConvTranspose` drop-in that avoids input-dilated convolutions.

    XLA lowers `lax.conv_transpose` as a conv over the zero-dilated input;
    this module computes the SAME weighted sums through dense convolutions
    only, which map onto the MXU without the dilated-lhs handling:

      * kernel 4, stride 2, 'SAME' (every upsampling layer in the reference
        stacks, `diffusion_net.py:20-203`): each of the 4 output phases
        (a, b) of `y[2m+a, 2n+b]` touches exactly one 2x2 sub-kernel
        `W[2r+a, 2s+b]` of the 4x4 kernel, so the layer is 4
        dense k=2 VALID convs over 1-padded input slices, interleaved back
        (sub-pixel / depth-to-space decomposition). MAC-for-MAC identical
        to the transposed conv; only float reassociation differs (~1e-7).
      * stride 1 on a 1x1 input with 'VALID' (the first layer of every
        generator): an exact flipped-kernel matmul
        `z @ W[::-1, ::-1].reshape`.
      * anything else (stride-1 'SAME' trailing layers): already a dense
        conv; routed through `lax.conv_transpose` unchanged.

    Parameter names/shapes match `nn.ConvTranspose` (`kernel` of shape
    (kh, kw, in, out), `bias`), so instances constructed with
    `name="ConvTranspose_i"` are checkpoint-interchangeable with the
    default implementation.

    MEASURED RESULT (tools/ab_deconv_impl.py, artifacts/ab_deconv_impl.json,
    TPU v5e, alternating A/B): the dense decomposition is SLOWER than XLA's
    dilated lowering at every scale tried — 0.67x (CIFAR B=128), 0.61x
    (B=256), 0.40x (celebaHQ-256 B=32) on the posterior-Langevin phase.
    XLA's conv_transpose handling is already near-optimal; the ~32% MFU
    gap is conv-stack physics, not the lowering. This module therefore
    stays OFF every production path. It earns its keep as (a) the recorded
    experiment and (b) an independently-derived numerical oracle for
    `lax.conv_transpose`'s phase/padding conventions, pinned by
    tests/test_models.py::test_phase_deconv_* — the same conventions the
    torch-parity suite relies on.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: str
    kernel_init: Callable[..., Any]
    bias_init: Callable[..., Any]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        x, kernel, bias = flax_dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)

        b, h, w, _ = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if self.strides == (1, 1) and self.padding == "VALID" and (h, w) == (1, 1):
            y = jnp.einsum("bi,rsio->brso", x[:, 0, 0, :], kernel[::-1, ::-1])
        elif self.strides == (2, 2) and (kh, kw) == (4, 4) and self.padding == "SAME":
            # W[2r+a, 2s+b, i, o] -> Wr[r, a, s, b, i, o]
            wr = kernel.reshape(2, 2, 2, 2, cin, self.features)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            phases = []
            for a in (0, 1):
                for bb in (0, 1):
                    xin = lax.slice(xp, (0, a, bb, 0), (b, a + h + 1, bb + w + 1, cin))
                    phases.append(
                        lax.conv_general_dilated(
                            xin, wr[:, a, :, bb], (1, 1), "VALID", dimension_numbers=dn
                        )
                    )
            arr = jnp.stack(phases).reshape(2, 2, b, h, w, self.features)
            y = arr.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * h, 2 * w, self.features)
        else:
            y = lax.conv_transpose(
                x, kernel, self.strides, self.padding, dimension_numbers=dn
            )
        return y + bias


DECONV_IMPLS = ("conv_transpose", "phase")


class DeconvGenerator(nn.Module):
    """G: z (B, nz) -> x (B, H, W, nc) in [-1, 1].

    LeakyReLU(0.2) between layers, Tanh at the output, torch-parity init.
    `impl='phase'` swaps each ConvTranspose for the dense-conv phase
    decomposition (`PhaseConvTranspose`) with an identical parameter tree —
    same math, MXU-friendlier lowering.
    """

    layers: Sequence[DeconvLayer]
    dtype: jnp.dtype = jnp.float32
    impl: str = "conv_transpose"

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        if self.impl not in DECONV_IMPLS:
            raise ValueError(f"unknown deconv impl {self.impl!r}; one of {DECONV_IMPLS}")
        b, nz = z.shape
        x = z.reshape(b, 1, 1, nz)
        n = len(self.layers)
        for i, (features, kernel, stride, padding) in enumerate(self.layers):
            kwargs = dict(
                features=features,
                kernel_size=(kernel, kernel),
                strides=(stride, stride),
                padding=padding,
                kernel_init=torch_kernel_init_transpose,
                bias_init=torch_bias_init(features * kernel * kernel),
                dtype=self.dtype,
            )
            if self.impl == "phase":
                x = PhaseConvTranspose(**kwargs, name=f"ConvTranspose_{i}")(x)
            else:
                x = nn.ConvTranspose(**kwargs)(x)
            if i < n - 1:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return jnp.tanh(x)


def make_generator(
    dataset: str, ngf: int, nc: int, dtype=jnp.float32, impl: str = "conv_transpose"
) -> DeconvGenerator:
    return DeconvGenerator(layers=generator_spec(dataset, ngf, nc), dtype=dtype, impl=impl)


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
