"""Training state: ONE pytree holding all params, optimizer states, EMA, PRNG.

Unlike the reference (four separate nn.Modules + three torch optimizers +
Python-side EMA copies, `train_gen_recon.py:129-161`), the full train state is
a single flax.struct pytree so the whole alternating update runs inside one
jit and checkpoints as one Orbax atom — including the EMA params and PRNG key
the reference forgets to restore (`train_gen_recon.py:163-170`, a documented
reference bug we fix rather than copy).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import DAMCAmortizer, LatentEBM, ToyGenerator, make_generator
from ..utils.config import Config


@struct.dataclass
class ModelBundle:
    """Static model definitions (hashable aux data, not traced)."""

    generator: Any = struct.field(pytree_node=False)
    ebm: Any = struct.field(pytree_node=False)
    amortizer: Any = struct.field(pytree_node=False)


@struct.dataclass
class Optimizers:
    g: Any = struct.field(pytree_node=False)
    e: Any = struct.field(pytree_node=False)
    q: Any = struct.field(pytree_node=False)


@struct.dataclass
class DAMCState:
    step: jax.Array
    rng: jax.Array
    params_g: Any
    params_e: Any
    params_q: Any
    params_q_ema: Any
    opt_g: Any
    opt_e: Any
    opt_q: Any


def lr_schedule(
    lr0: float, cfg: Config, updates_per_iter: int = 1
) -> Callable[[jax.Array], jax.Array]:
    """max(lr0 * decay^(iter // every), floor) — the reference's x0.99/1000
    multiplicative decay with a 1e-5 floor (`train_gen_recon.py:247-256`).

    optax drives schedules by the OPTIMIZER's update count; an optimizer
    stepped `updates_per_iter` times per training iteration (Q runs 6 inner
    updates, `train_gen_recon.py:211-220`) must divide that out or its lr
    decays updates_per_iter-times too fast relative to the reference's
    once-per-1000-ITERATIONS rule. floor((u*i + j)/(u*every)) ==
    floor(i/every) exactly for 0 <= j < u, so the per-iteration decay
    boundary is preserved."""
    o = cfg.optim
    every = o.lr_decay_every * updates_per_iter

    def schedule(step):
        return jnp.maximum(lr0 * o.lr_decay ** (step // every), o.lr_floor)

    return schedule


def make_optimizers(cfg: Config) -> Optimizers:
    o = cfg.optim
    b1, b2 = o.betas

    def adam(lr0, max_norm):
        return optax.chain(
            optax.clip_by_global_norm(max_norm),
            optax.adam(lr_schedule(lr0, cfg), b1=b1, b2=b2),
        )

    def adamw(lr0, max_norm, wd, updates_per_iter=1):
        return optax.chain(
            optax.clip_by_global_norm(max_norm),
            optax.adamw(
                lr_schedule(lr0, cfg, updates_per_iter),
                b1=b1, b2=b2, weight_decay=wd,
            ),
        )

    return Optimizers(
        g=adam(o.g_lr, o.g_max_norm),
        e=adam(o.e_lr, o.e_max_norm),
        q=adamw(o.q_lr, o.q_max_norm, o.q_weight_decay,
                updates_per_iter=cfg.train.q_updates),
    )


def build_models(cfg: Config) -> ModelBundle:
    m, d = cfg.model, cfg.diffusion
    dtype = jnp.dtype(m.compute_dtype)
    if m.dataset == "toy":
        generator = ToyGenerator()
        ebm = None
    else:
        generator = make_generator(m.dataset, ngf=m.ngf, nc=m.nc, dtype=dtype)
        ebm = LatentEBM(ndf=m.ndf)
    amortizer = DAMCAmortizer(
        nz=m.nz,
        nxemb=m.nxemb,
        ntemb=m.ntemb,
        nf=m.nf,
        nif=m.nif,
        nc=m.nc,
        dataset=m.dataset,
        encoder_dtype=dtype,
        n_interval=d.n_interval,
        logsnr_min=d.logsnr_min,
        logsnr_max=d.logsnr_max,
        var_type=d.var_type,
        with_noise=d.with_noise,
        residual=d.residual,
        cond_w=d.cond_w,
    )
    return ModelBundle(generator=generator, ebm=ebm, amortizer=amortizer)


def create_state_host_init(
    key: jax.Array, cfg: Config, models: Optional[ModelBundle] = None
) -> Tuple["DAMCState", "ModelBundle", "Optimizers"]:
    """create_state with the init programs run on the host CPU backend and
    the finished state transferred to the default device once.

    The dozens of tiny flax init programs cost ~143 s through this
    platform's remote-compile tunnel vs ~24 s on the host CPU (identical
    threefry bits either way — the PRNG is platform-invariant). Used by
    bench.py and the TPU measurement tools, where preamble wall burns the
    harness budget; training drivers keep plain create_state (they
    amortize init over hours)."""
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu0 = None
    if cpu0 is None or jax.default_backend() == "cpu":
        return create_state(key, cfg, models)
    with jax.default_device(cpu0):
        state, models, opts = create_state(key, cfg, models)
    return jax.device_put(state, jax.devices()[0]), models, opts


def create_state(
    key: jax.Array, cfg: Config, models: Optional[ModelBundle] = None
) -> Tuple[DAMCState, ModelBundle, Optimizers]:
    """Initialize all params (Q_ema starts as an exact copy of Q, matching
    `train_gen_recon.py:145-146`) and optimizer states."""
    models = models or build_models(cfg)
    opts = make_optimizers(cfg)
    m = cfg.model

    kg, ke, kq, krng = jax.random.split(key, 4)
    if m.dataset == "toy":
        x_dummy = jnp.zeros((2, 2))
        z_dummy = jnp.zeros((2, m.nz))
        params_g = models.generator.init(kg, z_dummy)
        params_e = None
    else:
        x_dummy = jnp.zeros((2, m.image_size, m.image_size, m.nc))
        z_dummy = jnp.zeros((2, m.nz))
        params_g = models.generator.init(kg, z_dummy)
        params_e = models.ebm.init(ke, z_dummy)
    params_q = models.amortizer.init(kq, x_dummy)

    return (
        DAMCState(
            step=jnp.zeros((), jnp.int32),
            rng=krng,
            params_g=params_g,
            params_e=params_e,
            params_q=params_q,
            params_q_ema=jax.tree.map(jnp.copy, params_q),
            opt_g=opts.g.init(params_g) if cfg.train.update_g else None,
            opt_e=opts.e.init(params_e) if (cfg.train.update_e and params_e is not None) else None,
            opt_q=opts.q.init(params_q),
        ),
        models,
        opts,
    )
