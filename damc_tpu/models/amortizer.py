"""DAMC amortizer Q — the central model (reference `_netQ_U`).

Bundles the conditional encoder, the prior embedder, and the latent denoiser
(`/root/reference/workspace/src/diffusion_net.py:537-645`; toy variant
`toy_example/src/diffusion_net.py:141-263` is the same module with an MLP
encoder — unified here, toy = config).

Design split (TPU-first): this module owns parameters and single-pass methods
(`encode`, `prior_embed`, `denoise`, `loss`); the 100-step reverse-diffusion
sweep lives in `damc_tpu.ops.reverse_diffusion` as a `lax.scan` over a pure
denoise closure — see `sample_q` / `sample_q_prior` below. Randomness is
explicit key threading (no global RNG).

The reference's unused legacy `xemb` parameter (`diffusion_net.py:576`) is
dead weight and not modeled.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.diffusion import diffusion_forward, logsnr_schedule
from ..ops.reverse_diffusion import reverse_diffusion_sample
from .common import torch_bias_init, torch_kernel_init
from .denoiser import LatentDenoiser
from .encoders import MLPEncoder, make_encoder


class PriorEmbedder(nn.Module):
    """Noise -> "prior embedding": nz -> 128 -> LeakyReLU(0.01) -> nxemb.

    Conditioning vector for UNconditional (prior) sampling; the reference
    feeds fresh N(0, I) noise through this MLP (`diffusion_net.py:577-581`,
    note the default 0.01 LeakyReLU slope there, unlike the 0.2 used
    elsewhere).
    """

    nxemb: int
    width: int = 128

    @nn.compact
    def __call__(self, noise: jax.Array) -> jax.Array:
        h = nn.Dense(
            self.width,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(noise.shape[-1]),
        )(noise)
        h = nn.leaky_relu(h, negative_slope=0.01)
        return nn.Dense(
            self.nxemb,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(h.shape[-1]),
        )(h)


class DAMCAmortizer(nn.Module):
    """Q: amortized sampler of p(z | x) (and p(z) when unconditioned).

    dataset='toy' selects the MLP encoder; otherwise the conv encoder family.
    """

    nz: int
    nxemb: int = 1024
    ntemb: int = 128
    nf: int = 4
    nif: int = 64
    nc: int = 3
    dataset: str = "cifar10"
    n_interval: int = 100
    logsnr_min: float = -5.1
    logsnr_max: float = 9.8
    var_type: str = "large"
    with_noise: bool = True
    residual: bool = True
    cond_w: float = 0.0
    # conv-encoder compute dtype; the denoiser stays fp32 (schedule safety)
    encoder_dtype: jnp.dtype = jnp.float32

    def setup(self):
        widths = None
        if self.dataset == "toy":
            self.encoder = MLPEncoder(nemb=self.nxemb)
        elif self.dataset == "stylegan":
            # Encoder is the FROZEN pretrained StyleGAN inversion encoder,
            # applied externally under stop-grad (`diffusion_net_stylegan.py:
            # 327-328,353-356`); widths pinned to 1024 for nz=7168 (`:210-296`).
            self.encoder = None
            widths = (1024, 1024)
        else:
            self.encoder = make_encoder(
                self.dataset, nemb=self.nxemb, nif=self.nif, dtype=self.encoder_dtype
            )
        self.prior_emb = PriorEmbedder(nxemb=self.nxemb)
        self.p = LatentDenoiser(
            nz=self.nz,
            nxemb=self.nxemb,
            ntemb=self.ntemb,
            nf=self.nf,
            residual=self.residual,
            widths=widths,
        )

    def encode(self, x: jax.Array) -> jax.Array:
        return self.encoder(x)

    def prior_embed(self, noise: jax.Array) -> jax.Array:
        return self.prior_emb(noise)

    def denoise(self, z: jax.Array, logsnr: jax.Array, xemb: jax.Array) -> jax.Array:
        return self.p(z, logsnr, xemb)

    def __call__(self, x: jax.Array) -> jax.Array:
        """Init-path only: touches every submodule so `.init` creates all params.

        For dataset='stylegan', `x` is the externally-computed embedding.
        """
        xemb = x if self.encoder is None else self.encoder(x)
        b = x.shape[0]
        _ = self.prior_emb(jnp.zeros((b, self.nz)))
        z = jnp.zeros((b, self.nz))
        logsnr = jnp.zeros((b,))
        return self.p(z, logsnr, xemb)

    def loss(
        self,
        key: jax.Array,
        z: jax.Array,
        x: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        xemb: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Masked denoising score-matching loss (per-sample, shape (B,)).

        Reference `calculate_loss` (`diffusion_net.py:624-645`): embed x (or a
        prior embedding of fresh noise where mask==0 / x is None), draw
        u ~ U[0,1] -> logsnr, forward-diffuse z, and regress the noise:
        0.5 * ||eps - eps_hat||^2.
        """
        b = z.shape[0]
        key_prior, key_u, key_eps = jax.random.split(key, 3)

        if x is not None or xemb is not None:
            if xemb is None:
                xemb = self.encoder(x)
            if mask is not None:
                prior_emb = self.prior_emb(
                    jax.random.normal(key_prior, (b, self.nz), z.dtype)
                )
                xemb = xemb * mask + prior_emb * (1.0 - mask)
        else:
            assert mask is None
            xemb = self.prior_emb(jax.random.normal(key_prior, (b, self.nz), z.dtype))

        u = jax.random.uniform(key_u, (b,))
        logsnr = logsnr_schedule(u, self.logsnr_min, self.logsnr_max)
        zt_dist = diffusion_forward(z, logsnr[:, None])
        eps = jax.random.normal(key_eps, z.shape, z.dtype)
        zt = zt_dist.mean + zt_dist.std.astype(z.dtype) * eps
        eps_pred = self.p(zt, logsnr, xemb)
        return 0.5 * jnp.sum((eps - eps_pred) ** 2, axis=-1)

    def terminal_reg(self, key: jax.Array, z: jax.Array) -> jax.Array:
        """T-step energy regularizer 0.5 ||z_T||^2 on the fully-diffused
        latent (StyleGAN variant's `calculate_reg`,
        `diffusion_net_stylegan.py:428-437`; defined for parity — the
        reference eval script never calls it)."""
        b = z.shape[0]
        logsnr_T = logsnr_schedule(
            jnp.ones((b,)), self.logsnr_min, self.logsnr_max
        )
        dist = diffusion_forward(z, logsnr_T[:, None])
        eps = jax.random.normal(key, z.shape, z.dtype)
        z_T = dist.mean + dist.std.astype(z.dtype) * eps
        return 0.5 * jnp.sum(z_T**2, axis=-1)


def sample_q(
    params,
    model: DAMCAmortizer,
    key: jax.Array,
    x: Optional[jax.Array] = None,
    b: Optional[int] = None,
    cond_w: float = 0.0,
    xemb: Optional[jax.Array] = None,
    dtype=jnp.float32,
    hoisted: bool = True,
    fused: Optional[bool] = None,
    fused_interpret: bool = False,
    mesh=None,
    row_seeds: Optional[jax.Array] = None,
) -> jax.Array:
    """Draw z ~ Q(. | x) (posterior) or z ~ Q(.) (prior when x is None).

    Pure function of (params, key): jit/pjit-friendly; the reverse sweep is a
    `lax.scan` (see `ops/reverse_diffusion.py`). Mirrors `_netQ_U.forward`
    (`diffusion_net.py:585-622`) including optional classifier-free guidance.
    Pass `xemb` directly for external-encoder variants (StyleGAN).

    When `hoisted` (default) and no guidance is active, the per-step-constant
    context matmuls of every denoiser layer are precomputed once for the
    whole sweep (exact same math, hoisted out of the scan — see
    `models/denoiser.py::LatentDenoiser.sample_tables`).

    `fused` selects the single-kernel Pallas sweep
    (`ops/pallas/fused_qsweep.py`: whole denoiser + tables + chain VMEM-
    resident for all n steps). None = auto: on TPU, when the hoisted path is
    active and the denoiser family fits the VMEM budget (the StyleGAN-width
    variant does not and keeps the scan). Ancestral noise then comes from
    the on-core PRNG — same distribution, different stream than the scan
    path for the same key (noiseless sweeps are bit-comparable; tested).

    `mesh`: with a multi-device `data` axis, the fused kernel dispatches
    through `jax.shard_map` over that axis (`fused_reverse_sweep_sharded`) —
    `pallas_call` is opaque to GSPMD, so the sharded dispatch is what a
    multi-chip deployment must run (the scan path partitions via GSPMD).

    `row_seeds` ((B,) int32): per-row counter noise for the fused sweep —
    row i's ancestral noise depends only on row_seeds[i] (serving
    determinism). Only honored on the fused path; see `sample_q_per_item`
    for the full per-item contract.
    """
    key_init, key_emb, key_sweep = jax.random.split(key, 3)

    if xemb is not None:
        b = xemb.shape[0]
        x = xemb  # mark conditional for the guidance branch below
    elif x is not None:
        b = x.shape[0]
        xemb = model.apply(params, x, method="encode")
    else:
        assert b is not None
        noise = jax.random.normal(key_emb, (b, model.nz), dtype)
        xemb = model.apply(params, noise, method="prior_embed")

    z_init = jax.random.normal(key_init, (b, model.nz), dtype)

    use_guidance = x is not None and cond_w > 0
    guided = None
    step_xs = None

    if hoisted and not use_guidance:
        # Precompute the sweep's logsnr grid (same order as the scan:
        # i = n-1 .. 0) and the split context tables.
        n = model.n_interval
        from ..ops.diffusion import sweep_logsnr_grid

        grid, _ = sweep_logsnr_grid(n, model.logsnr_min, model.logsnr_max)
        tables = model.apply(
            params, grid, xemb, method=lambda m, g, e: m.p.sample_tables(g, e)
        )
        step_xs = tables["pre_t"]  # leading axis n, sliced by the scan
        pre_x = tables["pre_x"]

        from ..ops.pallas.fused_qsweep import (
            denoiser_layer_params,
            fits_vmem,
            fused_reverse_sweep,
            fused_reverse_sweep_sharded,
            step_coefficients,
        )

        fourier, layers = denoiser_layer_params(
            jax.tree_util.tree_map(jax.lax.stop_gradient, params)["params"]["p"]
        )
        if fused is None:
            # The fused kernel is Mosaic-TPU only: never auto-dispatch it on
            # GPU or other non-TPU backends (no lowering for pltpu ops).
            fused = (
                jax.default_backend() == "tpu"
                and fits_vmem(fourier, layers, pre_x, step_xs)
            )
        if fused:
            coeffs = step_coefficients(
                n, model.logsnr_min, model.logsnr_max, model.var_type
            )
            seed = None
            if row_seeds is None:
                seed = jax.random.randint(
                    key_sweep, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32
                )
            # Match the scan branch's output contract: Q-samples are
            # DETACHED (stop_gradient on every array input severs the AD
            # path before pallas_call, which has no autodiff rule) and
            # honor the requested dtype.
            sg = jax.lax.stop_gradient
            kw = dict(
                seed=seed, row_seeds=row_seeds, steps=n,
                with_noise=model.with_noise, residual=model.residual,
                interpret=fused_interpret,
            )
            if mesh is not None and mesh.shape.get("data", 1) > 1:
                out = fused_reverse_sweep_sharded(
                    mesh, sg(z_init), fourier, layers, sg(pre_x),
                    sg(step_xs), coeffs, **kw,
                )
            else:
                out = fused_reverse_sweep(
                    sg(z_init), fourier, layers, sg(pre_x), sg(step_xs),
                    coeffs, **kw,
                )
            return out.astype(dtype)

        def denoise_fn(z, logsnr, pre_t_step):
            return model.apply(
                params,
                z,
                pre_t_step,
                pre_x,
                method=lambda m, zz, t, xx: m.p.denoise_from_tables(zz, t, xx),
            )

    else:

        def denoise_fn(z, logsnr):
            return model.apply(params, z, logsnr, xemb, method="denoise")

        if use_guidance:

            def guided(step_key, z, logsnr):
                noise = jax.random.normal(step_key, (b, model.nz), dtype)
                xemb_unc = model.apply(params, noise, method="prior_embed")
                return model.apply(params, z, logsnr, xemb_unc, method="denoise")

    if row_seeds is not None:
        # A silent scan fallback would draw the ancestral noise from one
        # batch-level stream, voiding the per-row determinism contract.
        raise ValueError(
            "sample_q: row_seeds requires the fused Pallas sweep; use "
            "sample_q_per_item (vmap-of-single fallback) on this path"
        )
    return reverse_diffusion_sample(
        key_sweep,
        denoise_fn,
        z_init,
        n_interval=model.n_interval,
        logsnr_min=model.logsnr_min,
        logsnr_max=model.logsnr_max,
        var_type=model.var_type,
        with_noise=model.with_noise,
        guided_denoise_fn=guided,
        cond_w=cond_w,
        step_xs=step_xs,
    )


def sample_q_per_item(
    params,
    model: DAMCAmortizer,
    keys: jax.Array,
    x: Optional[jax.Array] = None,
    xemb: Optional[jax.Array] = None,
    dtype=jnp.float32,
    fused: Optional[bool] = None,
    fused_interpret: bool = False,
    mesh=None,
) -> jax.Array:
    """Draw a batch of Q samples where row i is a pure function of
    (params, keys[i], x[i]) — independent of batch composition and order.

    This is the serving runtime's determinism contract (serve.py): a
    request's result must not depend on which strangers it was coalesced
    with. Per-row subkeys drive every row-local draw (z_init, the
    prior-embedding noise), and the reverse sweep runs the fused Pallas
    kernel in counter-noise mode (`row_seeds`: `ops/pallas/fused_qsweep.py`)
    so the ancestral noise is per-row too. Where the fused kernel is
    unavailable (`fused=False`, or auto on a non-TPU backend) it falls back
    to `jax.vmap` of the single-item `sample_q` — same contract, different
    (threefry) noise stream.

    Args:
      keys: (B, 2) uint32 PRNG keys, one per row.
      x / xemb: per-row conditioning (posterior) or None (prior sampling).
      fused: None = auto (TPU + VMEM fit), True/False to force.
      fused_interpret: run the kernel in interpreter mode (CPU testing of
        the exact fused program — the counter noise is real there).
      mesh: dispatch the fused sweep through shard_map over `data`.
    """
    b = keys.shape[0]
    split3 = jax.vmap(lambda k: jax.random.split(k, 3))
    ks = split3(keys)  # (B, 3, key)
    k_init, k_emb, k_sweep = ks[:, 0], ks[:, 1], ks[:, 2]

    if xemb is not None:
        b = xemb.shape[0]
    elif x is not None:
        xemb = model.apply(params, x, method="encode")
    else:
        noise = jax.vmap(
            lambda k: jax.random.normal(k, (model.nz,), dtype)
        )(k_emb)
        xemb = model.apply(params, noise, method="prior_embed")

    z_init = jax.vmap(lambda k: jax.random.normal(k, (model.nz,), dtype))(k_init)

    from ..ops.diffusion import sweep_logsnr_grid
    from ..ops.pallas.fused_qsweep import (
        denoiser_layer_params,
        fits_vmem,
        fused_reverse_sweep,
        fused_reverse_sweep_sharded,
        step_coefficients,
    )

    n = model.n_interval
    grid, _ = sweep_logsnr_grid(n, model.logsnr_min, model.logsnr_max)
    tables = model.apply(
        params, grid, xemb, method=lambda m, g, e: m.p.sample_tables(g, e)
    )
    pre_x, pre_t = tables["pre_x"], tables["pre_t"]
    fourier, layers = denoiser_layer_params(
        jax.tree_util.tree_map(jax.lax.stop_gradient, params)["params"]["p"]
    )
    if fused is None:
        fused = (
            jax.default_backend() == "tpu"
            and fits_vmem(fourier, layers, pre_x, pre_t)
        )

    if not fused:
        # vmap-of-single: the pre-round-4 serving implementation; per-row
        # keys, scan sweep. Same contract, different noise stream.
        if x is not None or xemb is not None:
            one = lambda k, e: sample_q(
                params, model, k, xemb=e[None], fused=False
            )[0]
            return jax.vmap(one)(keys, xemb).astype(dtype)
        one = lambda k: sample_q(params, model, k, x=None, b=1, fused=False)[0]
        return jax.vmap(one)(keys).astype(dtype)

    row_seeds = jax.vmap(
        lambda k: jax.random.randint(k, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
    )(k_sweep)
    coeffs = step_coefficients(
        n, model.logsnr_min, model.logsnr_max, model.var_type
    )
    sg = jax.lax.stop_gradient
    kw = dict(
        row_seeds=row_seeds, steps=n, with_noise=model.with_noise,
        residual=model.residual, interpret=fused_interpret,
    )
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        out = fused_reverse_sweep_sharded(
            mesh, sg(z_init), fourier, layers, sg(pre_x), sg(pre_t),
            coeffs, **kw,
        )
    else:
        out = fused_reverse_sweep(
            sg(z_init), fourier, layers, sg(pre_x), sg(pre_t), coeffs, **kw
        )
    return out.astype(dtype)
