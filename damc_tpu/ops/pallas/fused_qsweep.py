"""Pallas TPU kernel: the ENTIRE n-step DAMC reverse-diffusion sweep.

The amortized sampler Q (reference `_netQ_U.forward`,
`/root/reference/workspace/src/diffusion_net.py:585-622`) is a 100-step
ancestral sweep whose per-step work is one latent-denoiser forward — seven
FiLM-gated linear layers over (B, <=512) blocks. Under XLA's `lax.scan`
each small matmul round-trips activations through HBM and the MXU runs at
~2-5% utilization (measured ~4.6 ms for 100 steps at B=128 on v5e). This
kernel keeps EVERYTHING resident in VMEM for the whole sweep:

  * all denoiser weights (~6 MB for the CIFAR-10 family),
  * the hoisted per-step/per-sample context tables of
    `models/denoiser.py::sample_tables` (the algebraic split
    SiLU([t,x]) @ K == SiLU(t) @ Kt + SiLU(x) @ Kx),
  * the chain state and activations,

and draws ancestral noise from the on-core PRNG (Box-Muller), so one kernel
launch replaces 100 scan iterations of HBM traffic.

Schedule parity by construction: the per-step scalars (x0-prediction and
ancestral-mean coefficients, std, last-step flag) are NOT re-derived here —
they are extracted from `ops.diffusion.pred_x_from_eps` /
`diffusion_reverse` by linearity probing (those maps are linear in (z, eps)
and (z_t, x) with logsnr-only coefficients), so the kernel consumes the
exact fp32 numbers the lax.scan path computes.

VMEM gating: the kernel is for the compact denoiser family (CIFAR/SVHN/
CelebA/MNIST/toy widths). The StyleGAN variant (widths 1024, nz=7168,
~118 MB of layer-1 weights alone) cannot fit and keeps the scan path —
`fits_vmem()` decides and `sample_q` auto-dispatches.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..diffusion import diffusion_reverse, pred_x_from_eps, sweep_logsnr_grid
from .fused_langevin import _counter_normal, _interpret_mode, _normal_sample

# Per-layer refs, in order: lin_k, lin_b, skip_k, skip_b, gate_k, gate_b,
# hyper_k, pre_x, pre_t.
_REFS_PER_LAYER = 9
_N_COEF = 6  # c1, c2, m_z, m_x, std, is_last
_LRELU = 0.01  # the denoiser's activation slope (`diffusion_net.py:520`)

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
# fp32 MXU precision: the sampler is a 100-step residual recursion, so
# single-pass-bf16 rounding (TPU 'default') visibly perturbs z_0; run the
# kernel's dots at HIGHEST (f32-accurate passes) like the fp32 reference.
_PRECISION = jax.lax.Precision.HIGHEST


def step_coefficients(
    n_interval: int, logsnr_min: float, logsnr_max: float, var_type: str
) -> jax.Array:
    """(n, 6) fp32 table [c1, c2, m_z, m_x, std, is_last] per sweep step.

    Extracted from the canonical diffusion ops by linearity probing so the
    fused kernel's schedule math is bit-identical to the scan path
    (`ops/reverse_diffusion.py:72-105`).
    """
    n = n_interval
    i_arr = jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
    logsnr_t, logsnr_s = sweep_logsnr_grid(n, logsnr_min, logsnr_max)
    one = jnp.ones_like(logsnr_t)
    zero = jnp.zeros_like(logsnr_t)
    # pred_x_from_eps is linear: x_hat = c1 * z - c2 * eps.
    c1 = pred_x_from_eps(one, zero, logsnr_t)
    c2 = -pred_x_from_eps(zero, one, logsnr_t)
    # ancestral mean is linear: mean = m_z * z_t + m_x * x_hat.
    dist_z = diffusion_reverse(zero, one, logsnr_s, logsnr_t, var_type)
    dist_x = diffusion_reverse(one, zero, logsnr_s, logsnr_t, var_type)
    std = dist_z.std
    is_last = (i_arr == 0.0).astype(jnp.float32)
    return jnp.stack(
        [c1, c2, dist_z.mean, dist_x.mean, std, is_last], axis=-1
    ).astype(jnp.float32)


def _kernel(
    *refs,
    n_layers: int,
    steps: int,
    with_noise: bool,
    residual: bool,
    noise_pair: bool = True,
    per_row: bool = False,
):
    (seed_ref, coef_ref, z_ref, fourier_ref), rest = refs[:4], refs[4:]
    layer_refs = [
        rest[i * _REFS_PER_LAYER : (i + 1) * _REFS_PER_LAYER]
        for i in range(n_layers)
    ]
    out_ref = rest[n_layers * _REFS_PER_LAYER]

    if with_noise and not per_row:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    row_seeds = (
        pltpu.bitcast(seed_ref[:], jnp.uint32) if (with_noise and per_row) else None
    )

    fourier = fourier_ref[:]
    weights = []  # VMEM-resident for the whole sweep
    for lr in layer_refs:
        lin_k, lin_b, skip_k, skip_b, gate_k, gate_b, hyper_k, pre_x, _ = lr
        weights.append(
            (lin_k[:], lin_b[:], skip_k[:], skip_b[:], gate_k[:], gate_b[:],
             hyper_k[:], pre_x[:])
        )

    two_pi = 2.0 * np.pi

    def denoise(z, step):
        films = []
        for li in range(n_layers):
            lin_k, lin_b, skip_k, skip_b, gate_k, gate_b, hyper_k, pre_x = weights[li]
            pre_t_row = layer_refs[li][8][pl.ds(step, 1), :]  # (1, dout)
            pre = pre_t_row + pre_x  # broadcast over the block
            c = jax.nn.silu(pre)
            gate = jax.nn.sigmoid(
                jnp.dot(c, gate_k, preferred_element_type=jnp.float32, precision=_PRECISION) + gate_b
            )
            bias = jnp.dot(c, hyper_k, preferred_element_type=jnp.float32, precision=_PRECISION)
            films.append((gate, bias))

        def apply_layer(li, h):
            lin_k, lin_b, skip_k, skip_b = weights[li][:4]
            gate, bias = films[li]
            return (
                (jnp.dot(h, lin_k, preferred_element_type=jnp.float32, precision=_PRECISION) + lin_b)
                * gate
                + bias
                + jnp.dot(h, skip_k, preferred_element_type=jnp.float32, precision=_PRECISION)
                + skip_b
            )

        act = lambda h: jnp.where(h >= 0.0, h, _LRELU * h)

        # Random-Fourier args reach hundreds of radians (z @ B ~ N(0, nz));
        # Mosaic's sin/cos loses ~1e-2 there. sin(2*pi*t) has period 1 in t,
        # so reduce t to [-0.5, 0.5] EXACTLY before the 2*pi multiply — this
        # is more accurate than libm's own reduction of the large product.
        t = jnp.dot(z, fourier, preferred_element_type=jnp.float32, precision=_PRECISION)
        t = t - jnp.round(t)
        proj = two_pi * t
        h = jnp.concatenate([jnp.sin(proj), jnp.cos(proj), z], axis=-1)
        # U-Net body (`models/denoiser.py::_unet`): 3 in, 1 mid, 3 out with
        # skip concats; activation AFTER storing the skip, BEFORE out layers.
        hs = []
        li = 0
        for _ in range(3):
            h = apply_layer(li, h); li += 1
            hs.append(h)
            h = act(h)
        h = apply_layer(li, h); li += 1
        for _ in range(3):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = act(h)
            h = apply_layer(li, h); li += 1
        return z + h if residual else h

    def body(step, z):
        row = coef_ref[pl.ds(step, 1), :]  # (1, 6)
        c1, c2 = row[0, 0], row[0, 1]
        m_z, m_x = row[0, 2], row[0, 3]
        std, is_last = row[0, 4], row[0, 5]

        eps = denoise(z, step)
        x_pred = c1 * z - c2 * eps
        z_next = m_z * z + m_x * x_pred
        if with_noise:
            noise = (
                _counter_normal(row_seeds, step, z.shape)
                if per_row
                else _normal_sample(z.shape, pair=noise_pair)
            )
            z_next = z_next + std * noise
        return jnp.where(is_last > 0.5, x_pred, z_next)

    out_ref[:] = jax.lax.fori_loop(0, steps, body, z_ref[:])


def _layer_tuple(p) -> Tuple[jax.Array, ...]:
    """Flatten one ConcatSquashLinear param dict into the kernel's ref order
    (without the per-chain/per-step tables)."""
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return (
        f32(p["_lin"]["kernel"]),
        f32(p["_lin"]["bias"]).reshape(1, -1),
        f32(p["_skip"]["kernel"]),
        f32(p["_skip"]["bias"]).reshape(1, -1),
        f32(p["_gate"]["kernel"]),
        f32(p["_gate"]["bias"]).reshape(1, -1),
        f32(p["_hyper_bias"]["kernel"]),
    )


def denoiser_layer_params(denoiser_params) -> Tuple[jax.Array, List]:
    """Extract (fourier_b, [per-layer weight tuples]) from a LatentDenoiser
    param subtree, ordered in/mid/out like `LatentDenoiser._all_layers`."""
    p = denoiser_params
    fourier = jnp.asarray(p["fourier_b"], jnp.float32)
    names = [f"in_layers_{i}" for i in range(3)] + ["mid_layers_0"] + [
        f"out_layers_{i}" for i in range(3)
    ]
    return fourier, [_layer_tuple(p[name]) for name in names]


def _padded(shape) -> int:
    """Mosaic tile-padded element count: last dim to 128 lanes, second-minor
    to 8 sublanes (fp32)."""
    if len(shape) == 0:
        return 1
    dims = list(shape)
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // 8) * 8
    return int(np.prod(dims))


def estimate_vmem_bytes(fourier, layers, pre_x, pre_t, block_b: int) -> int:
    """VMEM footprint of the fused sweep at a given chain block, including
    Mosaic lane/sublane padding and double buffering of the grid-blocked
    operands (z and the pre_x tables stream per block; weights/tables are
    grid-invariant single copies)."""
    total = _padded(fourier.shape)
    for lt in layers:
        total += sum(_padded(t.shape) for t in lt)
    for t in pre_t:
        total += _padded(t.shape)
    widths = [t.shape[-1] for t in pre_x]
    # double-buffered blocked operands: z + every pre_x block
    nz_pad = -(-fourier.shape[0] // 128) * 128
    total += 2 * block_b * nz_pad
    total += 2 * sum(_padded((block_b, w)) for w in widths)
    # live activations: input emb + skip stack + concat + film pair
    total += _padded((block_b, 4 * nz_pad))
    total += 8 * _padded((block_b, max(widths)))
    return int(total * 4)


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "with_noise", "residual", "interpret", "block_b", "noise_pair"
    ),
)
def fused_reverse_sweep(
    z_init: jax.Array,
    fourier: jax.Array,
    layers: Sequence[Tuple[jax.Array, ...]],
    pre_x: Sequence[jax.Array],
    pre_t: Sequence[jax.Array],
    coeffs: jax.Array,
    seed: jax.Array = None,
    steps: int = 1,
    with_noise: bool = True,
    residual: bool = True,
    interpret: bool = False,
    block_b: int = 128,
    noise_pair: bool = True,
    row_seeds: jax.Array = None,
) -> jax.Array:
    """Run the whole n-step reverse sweep in one Pallas kernel.

    Args mirror the hoisted scan path: `pre_x[l]` (B, dout_l) sample tables,
    `pre_t[l]` (n, dout_l) step tables (`LatentDenoiser.sample_tables`),
    `coeffs` from `step_coefficients`. Chains tile over a 1-d grid in
    `block_b` rows (per-block PRNG streams), padding non-divisible batches.

    `row_seeds` ((B,) int32) switches the ancestral noise to the per-row
    counter stream (`fused_langevin._counter_normal`): row i depends only on
    (row_seeds[i], z_init[i], pre_x[*][i]) — independent of batch
    composition / blocking / sharding. Serving + shard_map use this mode.
    """
    n_layers = len(layers)
    b, nz = z_init.shape
    block_b = min(block_b, max(b, 8))
    n_blocks = -(-b // block_b)
    b_pad = n_blocks * block_b
    z32 = z_init.astype(jnp.float32)
    pre_x = [jnp.asarray(t, jnp.float32) for t in pre_x]
    if b_pad != b:
        z32 = jnp.pad(z32, ((0, b_pad - b), (0, 0)))
        pre_x = [jnp.pad(t, ((0, b_pad - b), (0, 0))) for t in pre_x]
    per_row = row_seeds is not None
    if per_row:
        seed_op = jnp.asarray(row_seeds, jnp.int32).reshape(-1, 1)
        if b_pad != b:
            seed_op = jnp.pad(seed_op, ((0, b_pad - b), (0, 0)))
        seed_spec = pl.BlockSpec((block_b, 1), lambda i: (i, 0))
    else:
        seed_op = jnp.asarray(
            0 if seed is None else seed, jnp.int32
        ).reshape(1)
        seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _kernel,
        n_layers=n_layers,
        steps=steps,
        with_noise=with_noise,
        residual=residual,
        noise_pair=noise_pair,
        per_row=per_row,
    )

    rep = lambda t: pl.BlockSpec(t.shape, lambda i: tuple([0] * t.ndim))
    in_specs = [
        seed_spec,
        rep(coeffs),
        pl.BlockSpec((block_b, nz), lambda i: (i, 0)),  # z
        rep(fourier),
    ]
    operands = [
        seed_op,
        jnp.asarray(coeffs, jnp.float32),
        z32,
        jnp.asarray(fourier, jnp.float32),
    ]
    for lt, px, pt in zip(layers, pre_x, pre_t):
        for t in lt:
            in_specs.append(rep(t))
            operands.append(t)
        in_specs.append(pl.BlockSpec((block_b, px.shape[-1]), lambda i: (i, 0)))
        operands.append(px)
        pt32 = jnp.asarray(pt, jnp.float32)
        in_specs.append(rep(pt32))
        operands.append(pt32)

    flops_per_step = 0
    for lt in layers:
        flops_per_step += 2 * b_pad * sum(
            int(np.prod(t.shape)) for t in lt if t.ndim == 2
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((b_pad, nz), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, nz), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=steps * flops_per_step,
            bytes_accessed=int(sum(np.prod(t.shape) for lt in layers for t in lt) * 4),
            transcendentals=steps * b_pad * nz * 4,
        ),
        interpret=_interpret_mode(interpret),
    )(*operands)
    return out[:b]


def fits_vmem(fourier, layers, pre_x, pre_t, block_b: int = 128) -> bool:
    return estimate_vmem_bytes(fourier, layers, pre_x, pre_t, block_b) <= _VMEM_BUDGET_BYTES


def fused_reverse_sweep_sharded(
    mesh,
    z_init: jax.Array,
    fourier: jax.Array,
    layers: Sequence[Tuple[jax.Array, ...]],
    pre_x: Sequence[jax.Array],
    pre_t: Sequence[jax.Array],
    coeffs: jax.Array,
    seed: jax.Array = None,
    steps: int = 1,
    with_noise: bool = True,
    residual: bool = True,
    interpret: bool = False,
    block_b: int = 128,
    noise_pair: bool = True,
    row_seeds: jax.Array = None,
    axis: str = "data",
) -> jax.Array:
    """`fused_reverse_sweep` partitioned over a mesh axis via shard_map.

    Same rationale as `fused_prior_langevin_sharded`: the kernel has no
    GSPMD partitioning rule, so this gives it one explicitly. The chain
    state and the per-sample context tables (`pre_x`) shard over `axis`;
    weights, per-step tables, and schedule coefficients replicate. Stream
    mode offsets each shard's seed by its local grid-block count; counter
    mode (`row_seeds`) shards the seeds with the rows and is bit-identical
    to the unsharded kernel. Pads non-divisible batches.
    """
    from jax.sharding import PartitionSpec as P

    kw = dict(
        steps=steps, with_noise=with_noise, residual=residual,
        interpret=interpret, block_b=block_b, noise_pair=noise_pair,
    )
    n = mesh.shape[axis]
    if n == 1:
        return fused_reverse_sweep(
            z_init, fourier, layers, pre_x, pre_t, coeffs,
            seed=seed, row_seeds=row_seeds, **kw,
        )
    b = z_init.shape[0]
    b_pad = -(-b // n) * n
    z32 = z_init.astype(jnp.float32)
    pre_x = [jnp.asarray(t, jnp.float32) for t in pre_x]
    if b_pad != b:
        z32 = jnp.pad(z32, ((0, b_pad - b), (0, 0)))
        pre_x = [jnp.pad(t, ((0, b_pad - b), (0, 0))) for t in pre_x]
    local_b = b_pad // n
    block_b_l = min(block_b, max(local_b, 8))
    local_blocks = -(-local_b // block_b_l)
    kw["block_b"] = block_b_l

    per_row = row_seeds is not None
    if per_row:
        seed_arg = jnp.asarray(row_seeds, jnp.int32)
        if b_pad != b:
            seed_arg = jnp.pad(seed_arg, (0, b_pad - b))
        seed_spec = P(axis)
    else:
        seed_arg = jnp.asarray(0 if seed is None else seed, jnp.int32)
        seed_spec = P()

    layers = [tuple(lt) for lt in layers]
    rep_layers = [tuple(P() for _ in lt) for lt in layers]

    def body(z_l, seed_l, fourier_, layers_, pre_x_, pre_t_, coeffs_):
        if per_row:
            skw = dict(row_seeds=seed_l)
        else:
            skw = dict(seed=seed_l + jax.lax.axis_index(axis) * local_blocks)
        return fused_reverse_sweep(
            z_l, fourier_, layers_, pre_x_, pre_t_, coeffs_, **skw, **kw
        )

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(axis), seed_spec, P(), rep_layers,
            [P(axis) for _ in pre_x], [P() for _ in pre_t], P(),
        ),
        out_specs=P(axis),
        check_vma=False,
    )(z32, seed_arg, fourier, layers, pre_x, list(pre_t), coeffs)
    return out[:b]
