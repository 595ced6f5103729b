"""Short-run Langevin MCMC kernels as jitted ``lax.scan`` loops.

TPU-first redesign of the reference samplers (`/root/reference/workspace/src/
MCMC.py:27-117`). Key differences from the CUDA/PyTorch reference:

* The whole K-step chain is ONE ``lax.scan`` under ``jit`` — no Python loop,
  no per-step host sync (the reference calls ``.item()`` every step,
  `MCMC.py:41,65-67`, forcing a device round-trip per step).
* Gradients of the energy come from ``jax.grad`` of a pure energy closure;
  "freezing" the networks is ``jax.lax.stop_gradient`` on the params inside
  the closure (replaces `set_requires_grad`, `MCMC.py:12-25`).
* B parallel chains are a batch axis: vmap-free batched math that shards over
  the ``data`` mesh axis under pjit (SURVEY.md §2.6).
* Per-step noise uses explicit key folding — reproducible per seed.

Diagnostics (per-step energies) are returned as scanned arrays so callers can
log without synchronizing the device inside the loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

# An energy function maps a batch of latents (B, nz) -> per-chain energies (B,).
EnergyFn = Callable[[jax.Array], jax.Array]


class LangevinDiagnostics(NamedTuple):
    """Per-step chain statistics, shape (steps,). Device-resident; no sync."""

    energy_sum: jax.Array  # sum over chains of the (total) energy
    grad_mean: jax.Array  # mean of the energy gradient entries


def langevin_sample(
    key: jax.Array,
    z_init: jax.Array,
    energy_fn: EnergyFn,
    steps: int,
    step_size: float,
    with_noise: bool = True,
    unroll: int = 1,
) -> Tuple[jax.Array, LangevinDiagnostics]:
    """Run ``steps`` of unadjusted Langevin dynamics on ``energy_fn``.

    Update rule (matches `MCMC.py:36-38`):
        z <- z - 0.5 * eps^2 * grad U(z) + eps * N(0, I)   [noise iff with_noise]

    Args:
      key: PRNG key; folded per step.
      z_init: (B, nz) initial chain states (B independent chains).
      energy_fn: per-chain energy U(z), returns (B,). Close over params with
        ``stop_gradient`` applied (see the ``*_energy`` factories below).
      steps: static chain length.
      step_size: Langevin step size eps.
      with_noise: include the diffusion noise term (MALA-without-MH style).
      unroll: ``lax.scan`` unroll factor — same math and PRNG stream, but
        NOT bit-identical output: unrolling changes XLA fusion/reassociation
        and ~30 chained steps amplify rounding to ~1e-2 elementwise (chain
        statistics unaffected; see ``tools/ab_posterior_unroll.py``). Keep
        the default on bit-exact parity-gated paths.

    Returns:
      (z_final, diagnostics); z_final carries no gradient back into the chain
      (callers differentiate outer losses at the final z only, like the
      reference's ``.detach()`` at `MCMC.py:46,74`).
    """
    step_size = jnp.asarray(step_size, z_init.dtype)

    def total_energy(z):
        en = energy_fn(z)
        return jnp.sum(en), en

    grad_fn = jax.grad(total_energy, has_aux=True)

    def body(z, step_key):
        z_grad, en = grad_fn(z)
        z = z - 0.5 * step_size * step_size * z_grad
        if with_noise:
            z = z + step_size * jax.random.normal(step_key, z.shape, z.dtype)
        diag = LangevinDiagnostics(
            energy_sum=jnp.sum(en), grad_mean=jnp.mean(z_grad)
        )
        return z, diag

    step_keys = jax.random.split(key, steps)
    z_final, diags = jax.lax.scan(body, z_init, step_keys, unroll=unroll)
    return jax.lax.stop_gradient(z_final), diags


def prior_energy(
    ebm_fn: Callable[[jax.Array], jax.Array],
) -> EnergyFn:
    """U(z) = E(z) + 0.5 ||z||^2 — the tilted-Gaussian EBM prior.

    (Reference: `MCMC.py:32-34`.) ``ebm_fn`` must already close over
    stop-gradient'ed params.
    """

    def energy(z):
        en = ebm_fn(z)
        en = en.reshape(z.shape[0], -1).sum(axis=-1)
        return en + 0.5 * jnp.sum(z * z, axis=-1)

    return energy


def posterior_energy(
    gen_fn: Callable[[jax.Array], jax.Array],
    ebm_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    llhd_sigma: float,
) -> EnergyFn:
    """U(z) = ||G(z) - x||^2 / (2 sigma^2) + E(z) + 0.5 ||z||^2.

    (Reference: `MCMC.py:54-59`.) The generator/EBM callables must close over
    stop-gradient'ed params; gradients flow only through z.
    """
    inv_two_sigma2 = 1.0 / (2.0 * llhd_sigma * llhd_sigma)

    def energy(z):
        x_hat = gen_fn(z)
        recon = jnp.sum(
            (x_hat - x).reshape(z.shape[0], -1) ** 2, axis=-1
        ) * inv_two_sigma2
        en = ebm_fn(z)
        en = en.reshape(z.shape[0], -1).sum(axis=-1)
        return recon + en + 0.5 * jnp.sum(z * z, axis=-1)

    return energy


def gaussian_posterior_energy(
    gen_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    llhd_sigma: float,
) -> EnergyFn:
    """Posterior energy with a plain N(0, I) prior (no EBM tilt).

    Used by the toy 2-D experiment (`toy_example/toy_example.py:110-131`).
    """
    inv_two_sigma2 = 1.0 / (2.0 * llhd_sigma * llhd_sigma)

    def energy(z):
        x_hat = gen_fn(z)
        recon = jnp.sum(
            (x_hat - x).reshape(z.shape[0], -1) ** 2, axis=-1
        ) * inv_two_sigma2
        return recon + 0.5 * jnp.sum(z * z, axis=-1)

    return energy


def prior_langevin_auto(
    key: jax.Array,
    z_init: jax.Array,
    ebm_model,
    ebm_params,
    steps: int,
    step_size: float,
    with_noise: bool = True,
    use_pallas: bool = True,
    dots_dtype: str = "float32",
    mesh=None,
    row_seeds: jax.Array = None,
    pallas_interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Prior-Langevin chain with automatic kernel selection.

    Uses the fused Pallas kernel (weights + chain VMEM-resident, on-core PRNG;
    see `ops/pallas/fused_langevin.py`, ~1.4x over the scan on TPU v5e) when
    the EBM is the standard 2-hidden-layer `LatentEBM` and we're on TPU;
    falls back to the `lax.scan` path otherwise.

    dots_dtype='bfloat16' runs the kernel's MXU dots on bf16 operands with
    fp32 accumulation/state/noise (the precision class the torch reference
    gets by default from TF32 on Ampere). Learning-validated but measured
    throughput-neutral at the standard EBM widths — the kernel is VPU-bound;
    see utils/config.py. Only the Pallas path honors it; the scan fallback
    stays fp32.

    mesh: when given (and its `data` axis is > 1), the fused kernel is
    dispatched through `jax.shard_map` over the `data` axis — the explicit
    partitioning rule a multi-chip deployment needs, since `pallas_call` is
    opaque to GSPMD (the scan fallback partitions via GSPMD as before).

    row_seeds: optional (B,) int32 per-chain seeds — switches the kernel's
    noise to the counter-based per-row stream (row i's chain depends only on
    row_seeds[i], independent of batch composition/blocking/sharding; the
    deterministic serving mode). `key` is then unused by the fused path.

    pallas_interpret: run the fused kernel in interpreter mode and bypass
    the TPU-backend gate — this makes the EXACT deployed dispatch (incl. the
    shard_map wrapping) testable on a CPU mesh (tests/test_pallas_sharding.py).

    Returns (z_final, final_energy_per_chain).
    """
    ebm_fn = lambda z: ebm_model.apply(jax.lax.stop_gradient(ebm_params), z)
    p = ebm_params.get("params", {}) if isinstance(ebm_params, dict) else {}
    is_standard_mlp = set(p.keys()) == {"Dense_0", "Dense_1", "Dense_2"}
    on_tpu = jax.default_backend() == "tpu" or pallas_interpret

    if use_pallas and on_tpu and not is_standard_mlp:
        # Key-set dispatch is deliberate (the kernel hand-codes the 2-hidden
        # MLP backward) but silent fallback on TPU would hide a perf
        # regression if the EBM is ever renamed/re-structured — say so once.
        import logging

        logging.getLogger(__name__).warning(
            "prior_langevin_auto: EBM param tree %s is not the standard "
            "2-hidden LatentEBM; falling back to the lax.scan path on TPU "
            "(expected for the 3-hidden StyleGAN EBM, a perf bug otherwise).",
            sorted(p.keys()),
        )

    if use_pallas and is_standard_mlp and on_tpu:
        from .pallas.fused_langevin import (
            ebm_params_to_dense_weights,
            fused_prior_langevin,
            fused_prior_langevin_sharded,
        )

        weights = ebm_params_to_dense_weights(jax.lax.stop_gradient(ebm_params))
        seed = None
        if row_seeds is None:
            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32
            )
        kw = dict(
            seed=seed, row_seeds=row_seeds, steps=steps,
            step_size=float(step_size), with_noise=with_noise,
            dots_dtype=dots_dtype, interpret=pallas_interpret,
        )
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            z_final = fused_prior_langevin_sharded(mesh, z_init, *weights, **kw)
        else:
            z_final = fused_prior_langevin(z_init, *weights, **kw)
    else:
        if row_seeds is not None:
            # A silent scan fallback here would draw all chains from one
            # batch-level stream, quietly voiding the per-row determinism
            # contract the caller asked for.
            raise ValueError(
                "prior_langevin_auto: row_seeds (per-row determinism) "
                "requires the fused Pallas path; use vmap-of-single scan "
                "chains instead on this backend/EBM"
            )
        z_final, _ = langevin_sample(
            key, z_init, prior_energy(ebm_fn), steps, step_size, with_noise
        )
    final_energy = prior_energy(ebm_fn)(z_final)
    return jax.lax.stop_gradient(z_final), jax.lax.stop_gradient(final_energy)


def adam_latent_descent(
    z_init: jax.Array,
    loss_fn: Callable[[jax.Array], jax.Array],
    steps: int,
    lr: float,
) -> Tuple[jax.Array, jax.Array]:
    """Adam refinement of latents, the StyleGAN-inversion "sampler".

    Re-implements the optimizer loop of `MCMC.py:97-107` (Adam on z with the
    caller-supplied scalar loss) as a single ``lax.scan``. NaN rescue (the
    reference's mapping-network resample, `MCMC.py:83-94`) is the caller's
    job since it needs the StyleGAN mapping net.

    Returns (z_final, per-step losses).
    """
    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(z_init)
    grad_fn = jax.value_and_grad(lambda z: jnp.sum(loss_fn(z)))

    def body(carry, _):
        z, opt_state = carry
        loss, g = grad_fn(z)
        updates, opt_state = opt.update(g, opt_state, z)
        z = optax.apply_updates(z, updates)
        return (z, opt_state), loss

    (z_final, _), losses = jax.lax.scan(body, (z_init, opt_state), None, length=steps)
    return jax.lax.stop_gradient(z_final), losses
