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

TPU-first optimization (the "hoisted" sampling path): during the n-step
ancestral sweep the context is [temb(step), xemb] where temb depends only on
the STEP and xemb only on the SAMPLE. Because SiLU acts elementwise on the
concatenation, every CSL layer's first context matmul separates exactly:

    SiLU([t, x]) @ [Kt; Kx] + b  ==  SiLU(t) @ Kt + SiLU(x) @ Kx + b

so `sample_tables` precomputes SiLU(xemb) @ Kx ONCE for the whole sweep and
SiLU(temb_grid) @ Kt for ALL steps in one batched matmul, removing the
dominant (B, ntemb+nxemb) @ (., d) matmul from every step of the scan — an
algebraic hoist across scan iterations that XLA cannot perform. The hoisted
path is numerically identical to `__call__` (tested).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

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


def _dense(features, fan_in, use_bias=True):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in),
    )


class ConcatSquashLinear(nn.Module):
    """FiLM-style gated linear with context and input skip.

    out = Lin(x) * sigmoid(gate(c)) + bias(c) + skip(x),
    c = SiLU(CtxLin(SiLU(ctx)))       (reference `diffusion_net.py:417-445`).

    The context linear's kernel/bias are owned directly so the sampling path
    can split it into step- and sample-dependent halves (see module docstring).
    """

    dim_in: int
    dim_out: int
    nctx: int  # ntemb + nxemb

    def setup(self):
        self.ctx_kernel = self.param(
            "ctx_kernel", torch_kernel_init, (self.nctx, self.dim_out)
        )
        self.ctx_bias = self.param(
            "ctx_bias", torch_bias_init(self.nctx), (self.dim_out,)
        )
        self._gate = _dense(self.dim_out, self.dim_out)
        self._hyper_bias = _dense(self.dim_out, self.dim_out, use_bias=False)
        self._lin = _dense(self.dim_out, self.dim_in)
        self._skip = _dense(self.dim_out, self.dim_in)

    def __call__(self, ctx: jax.Array, x: jax.Array) -> jax.Array:
        pre = jax.nn.silu(ctx) @ self.ctx_kernel + self.ctx_bias
        gate, bias = self.film_from_pre(pre)
        return self.apply_x(x, gate, bias)

    def ctx_pre_split(
        self, temb: jax.Array, xemb: jax.Array, ntemb: int
    ) -> Tuple[jax.Array, jax.Array]:
        """Separated halves of the first context matmul.

        pre = SiLU(temb) @ K[:ntemb] + bias   (step-dependent part)
            + SiLU(xemb) @ K[ntemb:]          (sample-dependent part)
        """
        pre_t = jax.nn.silu(temb) @ self.ctx_kernel[:ntemb] + self.ctx_bias
        pre_x = jax.nn.silu(xemb) @ self.ctx_kernel[ntemb:]
        return pre_t, pre_x

    def film_from_pre(self, pre: jax.Array) -> Tuple[jax.Array, jax.Array]:
        c = jax.nn.silu(pre)
        return jax.nn.sigmoid(self._gate(c)), self._hyper_bias(c)

    def apply_x(self, x: jax.Array, gate: jax.Array, bias: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.dim_in, (x.shape, self.dim_in)
        return self._lin(x) * gate + bias + self._skip(x)


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

    def setup(self):
        narrow, wide = self.widths or (32 * self.nf, 64 * self.nf)
        self._dims = (narrow, wide)
        nctx = self.ntemb + self.nxemb
        self.time_emb = SinusoidalTimeEmbedding(self.ntemb)
        self.time_d1 = _dense(self.ntemb, self.ntemb)
        self.time_d2 = _dense(self.ntemb, self.ntemb)
        self.fourier_b = self.param(
            "fourier_b", nn.initializers.normal(1.0), (self.nz, self.nz // 2)
        )
        self.in_layers = [
            ConcatSquashLinear(2 * self.nz, narrow, nctx),
            ConcatSquashLinear(narrow, wide, nctx),
            ConcatSquashLinear(wide, wide, nctx),
        ]
        self.mid_layers = [ConcatSquashLinear(wide, wide, nctx)]
        self.out_layers = [
            ConcatSquashLinear(2 * wide, wide, nctx),
            ConcatSquashLinear(2 * wide, narrow, nctx),
            ConcatSquashLinear(2 * narrow, self.nz, nctx),
        ]

    @property
    def _all_layers(self):
        return [*self.in_layers, *self.mid_layers, *self.out_layers]

    def _time_embed(self, logsnr: jax.Array) -> jax.Array:
        """arctan-warped logsnr -> temb (reference `diffusion_net.py:506-507`)."""
        logsnr_input = jnp.arctan(
            jnp.exp(-0.5 * jnp.clip(logsnr.astype(jnp.float32), -20.0, 20.0))
        ) / (0.5 * math.pi)
        temb = self.time_emb(logsnr_input)
        return self.time_d2(jax.nn.silu(self.time_d1(temb)))

    def _input_emb(self, z: jax.Array) -> jax.Array:
        proj = 2.0 * math.pi * (z @ self.fourier_b)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj), z], axis=-1)

    def _unet(self, z: jax.Array, film) -> jax.Array:
        """Shared U-Net body; `film(layer_idx) -> (gate, bias)`."""
        act = lambda h: nn.leaky_relu(h, negative_slope=0.01)
        out = self._input_emb(z)
        hs = []
        li = 0
        for layer in self.in_layers:
            out = layer.apply_x(out, *film(li)); li += 1
            hs.append(out)
            out = act(out)
        for layer in self.mid_layers:
            out = layer.apply_x(out, *film(li)); li += 1
        for layer in self.out_layers:
            out = jnp.concatenate([out, hs.pop()], axis=-1)
            out = act(out)
            out = layer.apply_x(out, *film(li)); li += 1
        assert out.shape == (z.shape[0], self.nz)
        return z + out if self.residual else out

    def __call__(self, z: jax.Array, logsnr: jax.Array, xemb: Optional[jax.Array]) -> jax.Array:
        b = z.shape[0]
        assert z.shape == (b, self.nz), z.shape
        assert logsnr.shape == (b,), logsnr.shape
        temb = self._time_embed(logsnr)
        if xemb is None:
            # Reference guard (`diffusion_net.py:508`): an unconditional
            # call is only valid when the net was built without an x
            # embedding — otherwise the ctx matmul fails with an opaque
            # dimension error deep in layer 0.
            assert self.nxemb == 0, (
                f"xemb=None requires nxemb == 0, but this denoiser was "
                f"built with nxemb={self.nxemb}"
            )
            ctx = temb
        else:
            assert xemb.shape == (b, self.nxemb), xemb.shape
            ctx = jnp.concatenate([temb, xemb.astype(temb.dtype)], axis=-1)

        layers = self._all_layers
        pres = [
            jax.nn.silu(ctx) @ l.ctx_kernel + l.ctx_bias for l in layers
        ]
        films = [l.film_from_pre(p) for l, p in zip(layers, pres)]
        return self._unet(z, lambda i: films[i])

    # ---- hoisted sampling path -------------------------------------------

    def sample_tables(self, logsnr_grid: jax.Array, xemb: jax.Array) -> Dict[str, Any]:
        """Precompute the per-step / per-sample halves of every CSL context.

        Args:
          logsnr_grid: (n,) the logsnr value of each reverse step.
          xemb: (B, nxemb) conditioning embedding (constant over the sweep).

        Returns {'pre_t': [(n, d)...], 'pre_x': [(B, d)...]} per layer.
        """
        temb_grid = self._time_embed(logsnr_grid)  # (n, ntemb)
        pre_t, pre_x = [], []
        for layer in self._all_layers:
            t_part, x_part = layer.ctx_pre_split(temb_grid, xemb, self.ntemb)
            pre_t.append(t_part)
            pre_x.append(x_part)
        return {"pre_t": pre_t, "pre_x": pre_x}

    def denoise_from_tables(
        self, z: jax.Array, pre_t_step, pre_x
    ) -> jax.Array:
        """One denoiser evaluation with this step's precomputed contexts.

        pre_t_step: list of (d,) rows (the current step's slice of pre_t);
        pre_x: list of (B, d) sample parts.
        """
        layers = self._all_layers
        films = [
            l.film_from_pre(t[None, :] + x)
            for l, t, x in zip(layers, pre_t_step, pre_x)
        ]
        return self._unet(z, lambda i: films[i])
