"""Latent diffusion denoiser: FiLM-gated MLP U-Net over z-vectors.

Re-implements the eps-predictor `Diffusion_UnetA` and its building blocks
(`/root/reference/workspace/src/diffusion_net.py:417-533`; StyleGAN-width
variant at `src/diffusion_net_stylegan.py:210-296`; toy fork unified here).
All the FLOPs are dense matmuls over (B, features) blocks — ideal MXU shape;
XLA fuses the gate/bias/skip elementwise tail into the matmuls.

Topology (nf=4, nz-dim latents):
  input_emb: random-Fourier features via learnable B in R^{nz x nz/2}:
             [sin(2 pi z B), cos(2 pi z B), z]  -> 2 nz dims
  in:   CSL(2nz -> 32nf) -> CSL(32nf -> 64nf) -> CSL(64nf -> 64nf)
  mid:  CSL(64nf -> 64nf)
  out:  skip-concat U-Net tail back down to nz
  ctx:  [time_mlp(arctan-warped logsnr), xemb]
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import torch_bias_init, torch_kernel_init


class SinusoidalTimeEmbedding(nn.Module):
    """Standard sin/cos positional embedding of a scalar time in [0, 1].

    Reference: `diffusion_net.py:447-461` with max_time=1 (the input is
    pre-warped into [0, 1], then scaled by 1000 internally).
    """

    dim: int
    max_time: float = 1.0

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        t = t * (1000.0 / self.max_time)
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
        )
        args = t[:, None].astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ConcatSquashLinear(nn.Module):
    """FiLM-style gated linear with context and input skip.

    out = Lin(x) * sigmoid(gate(c)) + bias(c) + skip(x),
    c = SiLU(Lin(SiLU(ctx)))          (reference `diffusion_net.py:417-445`).
    """

    dim_out: int

    @nn.compact
    def __call__(self, ctx: jax.Array, x: jax.Array) -> jax.Array:
        def dense(features, inp, use_bias=True):
            return nn.Dense(
                features,
                use_bias=use_bias,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(inp.shape[-1]),
            )(inp)

        c = nn.silu(ctx)
        c = dense(self.dim_out, c)
        c = nn.silu(c)

        gate = jax.nn.sigmoid(dense(self.dim_out, c))
        bias = dense(self.dim_out, c, use_bias=False)
        return dense(self.dim_out, x) * gate + bias + dense(self.dim_out, x)


class LatentDenoiser(nn.Module):
    """eps-predictor p(z_t, logsnr, xemb) -> eps_hat (B, nz).

    `widths` overrides the nf-derived layer widths (the StyleGAN variant pins
    all hidden widths to 1024 for nz=7168, `diffusion_net_stylegan.py:210-296`).
    """

    nz: int
    nxemb: int
    ntemb: int
    nf: int = 4
    residual: bool = False
    widths: Optional[Tuple[int, int]] = None  # (narrow, wide); default (32nf, 64nf)

    @nn.compact
    def __call__(self, z: jax.Array, logsnr: jax.Array, xemb: Optional[jax.Array]) -> jax.Array:
        b = z.shape[0]
        assert z.shape == (b, self.nz), z.shape
        assert logsnr.shape == (b,), logsnr.shape

        narrow, wide = self.widths or (32 * self.nf, 64 * self.nf)

        # Time context: warp logsnr into [0, 1] via arctan (reference
        # `diffusion_net.py:506`), embed, and pass through a small MLP.
        logsnr_input = jnp.arctan(
            jnp.exp(-0.5 * jnp.clip(logsnr.astype(jnp.float32), -20.0, 20.0))
        ) / (0.5 * math.pi)
        temb = SinusoidalTimeEmbedding(self.ntemb)(logsnr_input)
        temb = nn.Dense(
            self.ntemb,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.ntemb),
        )(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(
            self.ntemb,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.ntemb),
        )(temb)

        if xemb is None:
            ctx = temb
        else:
            assert xemb.shape == (b, self.nxemb), xemb.shape
            ctx = jnp.concatenate([temb, xemb.astype(temb.dtype)], axis=-1)

        # Random-Fourier input embedding with learnable frequency matrix B.
        fourier_b = self.param(
            "fourier_b", nn.initializers.normal(1.0), (self.nz, self.nz // 2)
        )
        proj = 2.0 * math.pi * (z @ fourier_b)
        out = jnp.concatenate([jnp.sin(proj), jnp.cos(proj), z], axis=-1)

        act = lambda h: nn.leaky_relu(h, negative_slope=0.01)

        hs = []
        for dim_out in (narrow, wide, wide):
            out = ConcatSquashLinear(dim_out)(ctx, out)
            hs.append(out)
            out = act(out)

        out = ConcatSquashLinear(wide)(ctx, out)

        for dim_out in (wide, narrow, self.nz):
            out = jnp.concatenate([out, hs.pop()], axis=-1)
            out = act(out)
            out = ConcatSquashLinear(dim_out)(ctx, out)

        assert out.shape == (b, self.nz)
        return z + out if self.residual else out
