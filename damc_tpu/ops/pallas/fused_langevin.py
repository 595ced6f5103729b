"""Pallas TPU kernel: the ENTIRE K-step prior-Langevin chain in one kernel.

The EBM prior sampler (`/root/reference/workspace/src/MCMC.py:27-46`) is the
purest hot loop in DAMC: K steps of

    z <- z - 0.5 eps^2 * (grad E(z) + z) + eps * N(0, I)

where E is the tiny latent MLP nz -> ndf -> ndf -> 1 (LeakyReLU 0.2,
`diffusion_net.py:207-223`). The XLA `lax.scan` path round-trips z through
HBM every step and pays threefry costs for the noise. This kernel instead:

  * pins z, all weights, and activations in VMEM for the whole chain
    (B=512 chains x nz=128 x fp32 + 2 x (ndf x ndf) weights << 16 MB);
  * runs the analytic forward AND backward of the MLP energy on the MXU
    inside a `fori_loop` (grad is hand-derived — no autodiff residuals);
  * draws Gaussian noise with the on-core PRNG (`pltpu.prng_random_bits`)
    via a Box-Muller transform — no HBM noise traffic.

The backward of U(z) = sum E(z) + 0.5 ||z||^2, with flax-layout kernels
(K1: nz x ndf, K2: ndf x ndf, k3: ndf x 1):

    h1p = z K1 + b1 ; h1 = lrelu(h1p)
    h2p = h1 K2 + b2 ; h2 = lrelu(h2p)
    dU/dz = (((k3^T * lrelu'(h2p)) K2^T) * lrelu'(h1p)) K1^T + z

Numerics note: the kernel keeps everything in fp32 (matching the reference);
Gaussian noise is exact Box-Muller over 2x uint32 draws.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LRELU_SLOPE = 0.2
_TWO_PI = 2.0 * math.pi


def _lrelu(x):
    return jnp.where(x >= 0.0, x, _LRELU_SLOPE * x)


def _dlrelu(x):
    return jnp.where(x >= 0.0, 1.0, _LRELU_SLOPE)


def _uniform_from_bits(bits):
    # uint32 -> (0, 1): use the top 24 bits, offset by half an ulp so u > 0.
    bits = pltpu.bitcast(bits, jnp.uint32)  # prng bits may come back as int32
    # After >> 8 the top bit is clear, so the int32 reinterpretation is the
    # same value — Mosaic lacks a uint32 -> f32 cast, int32 -> f32 exists.
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _normal_sample(shape, pair: bool = True):
    """Box-Muller from uint32 draws of the on-core PRNG.

    With `pair=True` both transform outputs (r·cos, r·sin — independent
    standard normals) are used when the row count is even: uniforms are
    drawn at half the rows and the two output branches are stacked on the
    sublane axis, halving the PRNG draws and the log/sqrt transcendentals
    per element while keeping full-lane shapes."""
    rows, cols = shape
    if pair and rows % 2 == 0:
        half = (rows // 2, cols)
        u1 = _uniform_from_bits(pltpu.prng_random_bits(half))
        u2 = _uniform_from_bits(pltpu.prng_random_bits(half))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = _TWO_PI * u2
        return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)
    u1 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u2 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


# ---------------------------------------------------------------------------
# Per-row counter-based Gaussian stream (serving determinism / sharding).
#
# The stream PRNG above is per-core: a row's noise depends on which block of
# which batch it lands in, so a serving request's result would vary with
# batch composition. This counter construction instead hashes
# (row_seed, step, draw, column) through two rounds of the murmur3 fmix32
# finalizer — a row's entire noise trajectory is a pure function of ITS seed,
# independent of batch composition, row position, grid blocking, or mesh
# sharding. Pure vector integer ops (xor/shift/mul on the VPU), no PRNG
# state, and — unlike `pltpu.prng_random_bits`, which the Pallas interpreter
# stubs to zeros — it produces REAL noise in interpret mode, so CPU tests
# exercise the exact noisy program. Statistical quality is moment/
# correlation-tested in tests/test_pallas_langevin.py and chain-stationarity
# validated on TPU (tools/validate_pallas_tpu.py).
# ---------------------------------------------------------------------------

_GOLD = 0x9E3779B9  # 2^32 / phi — Weyl increment for the counter
_COLC = 0x85EBCA77  # odd column multiplier


def _interpret_mode(interpret):
    """Map the kernels' `interpret` arg to a pallas_call `interpret=` value.

    False    -> compiled Mosaic (real TPU).
    True /
    'mosaic' -> the Mosaic TPU interpreter (`pltpu.InterpretParams`):
                simulates the on-core primitives incl. the stream PRNG, but
                its cost explodes under shard_map on CPU (a mid-size sweep
                kernel takes minutes); use for small single-shard tests.
    'plain'  -> the generic Pallas interpreter: fast enough for full-size
                CPU-mesh tests, but has no lowering for `pltpu.prng_*` —
                valid for noiseless chains and the counter-noise
                (`row_seeds`) mode only, which is exactly what the
                determinism/sharding tests exercise.
    """
    if interpret == "plain":
        return True
    if interpret:  # True or 'mosaic'
        return pltpu.InterpretParams()
    return False


def _mix32(x):
    """murmur3 fmix32: full-avalanche 32-bit finalizer (uint32 in/out)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _counter_bits(seeds_u32, counter, cols: int):
    """(rows, cols) hashed uint32 bits for per-row uint32 seeds and a scalar
    draw counter. seeds_u32 is (rows, 1); counter is a traced uint32."""
    col = pltpu.bitcast(
        jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1), jnp.uint32
    )
    base = _mix32(seeds_u32 ^ (counter * jnp.uint32(_GOLD)))  # (rows, 1)
    return _mix32(base ^ (col * jnp.uint32(_COLC)))  # (rows, cols)


def _counter_normal(seeds_u32, step, shape):
    """Per-row Box-Muller normals: element (i, j) at chain step `step` is a
    pure function of (seeds_u32[i], step, j)."""
    rows, cols = shape
    # Mosaic bitcast is >= 2-D only: lift the scalar step to (1, 1) int32
    # (non-negative, so the unsigned reinterpretation is the same value).
    s2 = jnp.full((1, 1), step, jnp.int32)
    cnt0 = pltpu.bitcast(s2 * 2, jnp.uint32)
    cnt1 = pltpu.bitcast(s2 * 2 + 1, jnp.uint32)
    u1 = _uniform_from_bits(_counter_bits(seeds_u32, cnt0, cols))
    u2 = _uniform_from_bits(_counter_bits(seeds_u32, cnt1, cols))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _kernel(
    seed_ref,
    z_ref,
    k1_ref,
    b1_ref,
    k2_ref,
    b2_ref,
    k3_ref,
    out_ref,
    *,
    steps: int,
    step_size: float,
    with_noise: bool,
    dots_dtype=jnp.float32,
    per_row: bool = False,
):
    if with_noise and not per_row:  # static; PRNG untouched on noiseless chains
        # Independent stream per chain-block (grid over the batch axis).
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    row_seeds = (
        pltpu.bitcast(seed_ref[:], jnp.uint32) if (with_noise and per_row) else None
    )
    # With dots_dtype=bfloat16 the MXU operands are bf16 (weights cast once,
    # activations per step) while accumulation, the chain state, the energy
    # gradient assembly, and the noise all stay fp32.
    k1 = k1_ref[:].astype(dots_dtype)
    b1 = b1_ref[:]
    k2 = k2_ref[:].astype(dots_dtype)
    b2 = b2_ref[:]
    k3 = k3_ref[:]  # (1, ndf): transposed final layer for row-vector math
    k1t = k1.T
    k2t = k2.T
    coeff = 0.5 * step_size * step_size

    def body(step, z):
        h1p = (
            jnp.dot(z.astype(dots_dtype), k1, preferred_element_type=jnp.float32)
            + b1
        )
        h1 = _lrelu(h1p)
        h2p = (
            jnp.dot(h1.astype(dots_dtype), k2, preferred_element_type=jnp.float32)
            + b2
        )
        # Backward (hand-derived; the energy head is linear in h2).
        d2 = _dlrelu(h2p) * k3  # (B, ndf) via broadcast of (1, ndf)
        d1 = _dlrelu(h1p) * jnp.dot(
            d2.astype(dots_dtype), k2t, preferred_element_type=jnp.float32
        )
        grad = (
            jnp.dot(d1.astype(dots_dtype), k1t, preferred_element_type=jnp.float32)
            + z
        )
        z = z - coeff * grad
        if with_noise:
            noise = (
                _counter_normal(row_seeds, step, z.shape)
                if per_row
                else _normal_sample(z.shape)
            )
            z = z + step_size * noise
        return z

    out_ref[:] = jax.lax.fori_loop(0, steps, body, z_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("steps", "step_size", "with_noise", "interpret", "dots_dtype"),
)
def fused_prior_langevin(
    z: jax.Array,
    k1: jax.Array,
    b1: jax.Array,
    k2: jax.Array,
    b2: jax.Array,
    k3: jax.Array,
    seed: jax.Array = None,
    steps: int = 1,
    step_size: float = 0.1,
    with_noise: bool = True,
    interpret: bool = False,
    dots_dtype: str = "float32",
    row_seeds: jax.Array = None,
) -> jax.Array:
    """Run the full K-step prior-Langevin chain in one Pallas kernel.

    Args:
      z: (B, nz) chain states (fp32).
      k1, b1, k2, b2: EBM dense weights in flax layout ((nz, ndf), (ndf,), ...).
      k3: (ndf,) or (ndf, 1) final energy head (bias irrelevant to the grad).
      seed: int32 scalar PRNG seed (stream mode; ignored when `row_seeds`).
      steps / step_size / with_noise: chain hyperparameters (static).
      interpret: run in TPU-interpreter mode (CPU testing; simulates the
        Mosaic primitives; NOTE the interpreter stubs `prng_random_bits` to
        zeros, so noisy stream-mode chains are shape-only on CPU — the
        `row_seeds` counter mode produces real noise everywhere).
      dots_dtype: 'float32' (default, exact scan parity) or 'bfloat16' —
        bf16 MXU operands with fp32 accumulation/state/noise. The energy
        gradient picks up ~1e-2 relative operand rounding, far below the
        per-step Langevin noise scale; stationary statistics are validated
        on TPU by tools/validate_pallas_tpu.py.
      row_seeds: optional (B,) int32 per-chain seeds. Switches the noise to
        the counter-based per-row stream (`_counter_normal`): row i's chain
        depends ONLY on (row_seeds[i], z[i]) — independent of batch
        composition, row order, grid blocking, and mesh sharding. Used by
        the deterministic serving path and the shard_map dispatch.
    """
    b1 = b1.reshape(1, -1).astype(jnp.float32)
    b2 = b2.reshape(1, -1).astype(jnp.float32)
    k3 = k3.reshape(1, -1).astype(jnp.float32)  # (1, ndf)
    per_row = row_seeds is not None

    kernel = functools.partial(
        _kernel,
        steps=steps,
        step_size=float(step_size),
        with_noise=with_noise,
        dots_dtype=jnp.dtype(dots_dtype).type,
        per_row=per_row,
    )

    # Tile the chain (batch) axis so arbitrarily many chains fit: each grid
    # step keeps one (block_b, nz) tile + weights + activations VMEM-resident
    # for the whole K-step chain. 1024 rows of nz=128/ndf=200 is ~6 MB of
    # scoped VMEM, comfortably under the 16 MB limit (4096 rows OOMs).
    b, nz = z.shape
    block_b = min(b, 1024)
    n_blocks = -(-b // block_b)
    b_pad = n_blocks * block_b
    z32 = z.astype(jnp.float32)
    if b_pad != b:
        z32 = jnp.pad(z32, ((0, b_pad - b), (0, 0)))
    if per_row:
        seed_op = jnp.asarray(row_seeds, jnp.int32).reshape(-1, 1)
        if b_pad != b:
            seed_op = jnp.pad(seed_op, ((0, b_pad - b), (0, 0)))
        seed_spec = pl.BlockSpec((block_b, 1), lambda i: (i, 0))
    else:
        if seed is None:
            seed = jnp.int32(0)
        seed_op = jnp.asarray(seed, jnp.int32).reshape(1)
        seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    # 4 MXU dots per step (fwd z@k1, h1@k2; input-bwd d2@k2^T, d1@k1^T)
    # = 2*nz*ndf + 2*ndf*ndf MACs per row (the ndf->1 head runs on the VPU).
    ndf = k1.shape[1]
    flops_per_step = 2 * b_pad * (2 * nz * ndf + 2 * ndf * ndf)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # replicated
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((b_pad, nz), jnp.float32),
        in_specs=[
            seed_spec,
            pl.BlockSpec((block_b, nz), lambda i: (i, 0)),
            rep(k1.shape),
            rep((1, b1.shape[1])),
            rep(k2.shape),
            rep((1, b2.shape[1])),
            rep((1, k3.shape[1])),
        ],
        out_specs=pl.BlockSpec((block_b, nz), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=steps * flops_per_step,
            bytes_accessed=b_pad * nz * 4 * 2 + k1.size * 4 + k2.size * 4,
            transcendentals=steps * b_pad * nz * 2 if with_noise else 0,
        ),
        interpret=_interpret_mode(interpret),
    )(seed_op, z32, k1.astype(jnp.float32), b1, k2.astype(jnp.float32), b2, k3)
    return out[:b]


def fused_prior_langevin_sharded(
    mesh,
    z: jax.Array,
    k1: jax.Array,
    b1: jax.Array,
    k2: jax.Array,
    b2: jax.Array,
    k3: jax.Array,
    seed: jax.Array = None,
    steps: int = 1,
    step_size: float = 0.1,
    with_noise: bool = True,
    interpret: bool = False,
    dots_dtype: str = "float32",
    row_seeds: jax.Array = None,
    axis: str = "data",
) -> jax.Array:
    """`fused_prior_langevin` partitioned over a mesh axis via shard_map.

    `pallas_call` is opaque to GSPMD: under pjit alone a multi-chip mesh
    would gather-and-replicate the chain batch around the kernel. This
    wrapper gives the kernel an explicit partitioning rule — chains are
    embarrassingly parallel, so each shard runs the identical kernel on its
    local (B/n, nz) rows with the weights replicated:

      * stream mode (scalar `seed`): each shard offsets the seed by
        `axis_index * local_block_count`, continuing the per-block stream
        layout of the single-device kernel — every grid block on every
        shard draws from a distinct PRNG stream;
      * counter mode (`row_seeds`): seeds shard with the rows; a row's
        noise is already independent of blocking/sharding by construction,
        so the sharded result is BIT-IDENTICAL to the unsharded one.

    Pads non-divisible batches (padded rows discarded). Works under `jit`
    with the same mesh (the caller's in_shardings place `z` on `axis`).
    """
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    if n == 1:
        return fused_prior_langevin(
            z, k1, b1, k2, b2, k3, seed=seed, steps=steps,
            step_size=step_size, with_noise=with_noise, interpret=interpret,
            dots_dtype=dots_dtype, row_seeds=row_seeds,
        )
    b = z.shape[0]
    b_pad = -(-b // n) * n
    z32 = z.astype(jnp.float32)
    if b_pad != b:
        z32 = jnp.pad(z32, ((0, b_pad - b), (0, 0)))
    local_b = b_pad // n
    block_b = min(local_b, 1024)
    local_blocks = -(-local_b // block_b)

    per_row = row_seeds is not None
    if per_row:
        seed_arg = jnp.asarray(row_seeds, jnp.int32)
        if b_pad != b:
            seed_arg = jnp.pad(seed_arg, (0, b_pad - b))
        seed_spec = P(axis)
    else:
        seed_arg = jnp.asarray(0 if seed is None else seed, jnp.int32)
        seed_spec = P()

    def body(z_l, seed_l, k1_, b1_, k2_, b2_, k3_):
        if per_row:
            kw = dict(row_seeds=seed_l)
        else:
            kw = dict(seed=seed_l + jax.lax.axis_index(axis) * local_blocks)
        return fused_prior_langevin(
            z_l, k1_, b1_, k2_, b2_, k3_, steps=steps, step_size=step_size,
            with_noise=with_noise, interpret=interpret, dots_dtype=dots_dtype,
            **kw,
        )

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), seed_spec, P(), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )(z32, seed_arg, k1, b1, k2, b2, k3)
    return out[:b]


def ebm_params_to_dense_weights(params) -> Tuple[jax.Array, ...]:
    """Extract (k1, b1, k2, b2, k3) from a LatentEBM param tree
    (`damc_tpu.models.ebm.LatentEBM` with n_hidden=2)."""
    p = params["params"]
    return (
        p["Dense_0"]["kernel"],
        p["Dense_0"]["bias"],
        p["Dense_1"]["kernel"],
        p["Dense_1"]["bias"],
        p["Dense_2"]["kernel"],
    )
