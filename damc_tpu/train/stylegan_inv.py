"""StyleGAN inversion workload (FFHQ / LSUN-tower): DAMC init + Adam refine.

Re-architecture of `eval_stylegan_inv.py` + `sample_invert_z`
(`/root/reference/workspace/src/MCMC.py:76-117`): the amortizer (frozen
pretrained StyleGAN encoder for conditioning, 1024-wide denoiser over 7168-d
W+ latents) proposes codes in one reverse-diffusion pass, NaN rows are rescued
by resampling truncated W codes through the mapping net, and an Adam loop
refines the latents under 1.5 * pixel MSE + 5e-5 * VGG16 perceptual MSE.
Everything (Q sweep + 100 Adam steps + generator/VGG forwards) runs in one
jitted program per batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .sampling import to_unit_range
import numpy as np

from ..models import stylegan as sg
from ..models.amortizer import DAMCAmortizer, sample_q
from ..ops.langevin import adam_latent_descent
from ..utils.config import Config


def make_stylegan_amortizer(cfg: Config, resolution: int = 256) -> DAMCAmortizer:
    """Q for the inversion workload: nz = nxemb = num_layers * 512 = 7168 at
    resolution 256 (`eval_stylegan_inv.py:61-62`)."""
    d = cfg.diffusion
    nz = sg.num_synthesis_layers(resolution) * sg.W_DIM
    return DAMCAmortizer(
        nz=nz,
        nxemb=nz,
        ntemb=cfg.model.ntemb,
        dataset="stylegan",
        n_interval=d.n_interval,
        logsnr_min=d.logsnr_min,
        logsnr_max=d.logsnr_max,
        var_type=d.var_type,
        with_noise=d.with_noise,
        residual=d.residual,
    )


def inversion_loss_fn(
    gen_params: Dict,
    vgg_params: Dict,
    x: jax.Array,
    resolution: int = 256,
    compute_dtype=None,
):
    """Per-image loss 1.5 * mse + 5e-5 * vgg_mse (`MCMC.py:100-103`).

    `compute_dtype` (e.g. jnp.bfloat16) runs the synthesis + VGG forwards
    and their input-backward in that dtype — the Adam-refine loop is
    bandwidth-bound in its elementwise stages (blur, norms, noise adds at
    256^2 with 64-128 channels; artifacts/mfu_inversion.json), so halving
    activation traffic is the available lever; f32 matmuls already run at
    the one-pass-bf16 MXU rate. z, the loss reductions, and Adam state stay
    float32 (grads cast back automatically at the dtype boundary).
    """
    if compute_dtype is not None:
        from ..utils.placement import cast_float_leaves

        gen_params = cast_float_leaves(gen_params, compute_dtype)
        vgg_params = cast_float_leaves(vgg_params, compute_dtype)
        x_c = x.astype(compute_dtype)
    else:
        x_c = x
    feat_x = jax.lax.stop_gradient(
        sg.vgg16_features(vgg_params, x_c)
    ).astype(jnp.float32)

    def loss(z):
        zc = z.astype(x_c.dtype)
        x_hat = sg.generator_apply(gen_params, zc, resolution).astype(jnp.float32)
        mse = jnp.mean((x_hat - x).reshape(z.shape[0], -1) ** 2, axis=-1)
        feat_hat = sg.vgg16_features(
            vgg_params, x_hat.astype(x_c.dtype)
        ).astype(jnp.float32)
        f_mse = jnp.mean((feat_x - feat_hat).reshape(z.shape[0], -1) ** 2, axis=-1)
        return 1.5 * mse + 5e-5 * f_mse

    return loss


def nan_rescue(
    key: jax.Array, gen_full_params: Dict, z: jax.Array, x: jax.Array,
    resolution: int = 256,
) -> jax.Array:
    """Replace latents whose reconstruction is NaN with fresh truncated W
    codes from the mapping net (`MCMC.py:83-94`)."""
    x_hat = sg.generator_apply({"synthesis": gen_full_params["synthesis"]}, z, resolution)
    recon = jnp.mean((x_hat - x).reshape(z.shape[0], -1) ** 2, axis=-1)
    bad = jnp.isnan(recon)[:, None]
    w = sg.sample_w_codes(gen_full_params, key, z.shape[0], resolution)
    return jnp.where(bad, w, z)


def invert_batch(
    key: jax.Array,
    q_params,
    q_model: DAMCAmortizer,
    stylegan_params: Dict,
    x: jax.Array,
    steps: int = 100,
    lr: float = 0.01,
    resolution: int = 256,
    compute_dtype=None,
    xemb: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full inversion for one batch: Q(x) -> NaN rescue -> Adam refine.

    `stylegan_params` needs keys 'generator' (with mapping/truncation/
    synthesis), 'encoder' (the frozen inversion encoder whose embedding
    conditions Q — reference `diffusion_net_stylegan.py:327-356`), and
    'vgg'. `compute_dtype` applies to the Adam-refine forwards/backwards
    only (see inversion_loss_fn); the Q sweep, rescue, and the returned
    x_hat stay float32. A caller that already holds the frozen encoder's
    embedding of x passes it as `xemb` to skip the (256², most expensive
    non-refine) encoder forward. Returns (x_hat, z, per-step losses).
    """
    k_q, k_rescue = jax.random.split(key)
    gen = stylegan_params["generator"]

    if xemb is None:
        xemb = sg.encoder_apply(stylegan_params["encoder"], x, resolution)
    z0 = sample_q(q_params, q_model, k_q, xemb=jax.lax.stop_gradient(xemb))
    z0 = nan_rescue(k_rescue, gen, z0, x, resolution)

    loss_fn = inversion_loss_fn(
        {"synthesis": gen["synthesis"]}, stylegan_params["vgg"], x, resolution,
        compute_dtype=compute_dtype,
    )
    z, losses = adam_latent_descent(z0, loss_fn, steps=steps, lr=lr)
    x_hat = sg.generator_apply({"synthesis": gen["synthesis"]}, z, resolution)
    return x_hat, z, losses


def make_inversion_train_step(
    q_model: DAMCAmortizer,
    stylegan_params: Dict,
    q_optimizer,
    refine_steps: int = 100,
    refine_lr: float = 0.01,
    resolution: int = 256,
    q_updates: int = 6,
    p_mask: float = 0.2,
):
    """Train step for the inversion amortizer (EXTENSION: the reference ships
    no training script for this workload, `eval_stylegan_inv.py` only —
    SURVEY.md §2.5 T5). One iteration mirrors the gen_recon recipe with the
    Adam-refined inversion as the posterior target:

        zk = AdamRefine(Q(x))  [frozen G/VGG/encoder]
        6x: Q <- denoising-score-matching on (x-embedding, zk) w/ p_mask

    Returns a jittable fn(q_params, q_opt_state, x, key) ->
    (q_params, q_opt_state, metrics).
    """
    import optax

    def step(q_params, q_opt_state, x, key):
        k_inv, k_mask, k_loss = jax.random.split(key, 3)
        # One frozen-encoder forward per step, shared between the inversion
        # sweep's conditioning and the Q loss below.
        xemb = jax.lax.stop_gradient(
            sg.encoder_apply(stylegan_params["encoder"], x, resolution)
        )
        x_hat, zk, losses = invert_batch(
            k_inv, q_params, q_model, stylegan_params, x,
            steps=refine_steps, lr=refine_lr, resolution=resolution,
            xemb=xemb,
        )
        zk = jax.lax.stop_gradient(zk)
        b = x.shape[0]
        mask = (jax.random.uniform(k_mask, (b,)) >= p_mask).astype(x.dtype)[:, None]

        def q_update(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(k_loss, i)
            loss_fn = lambda p: q_model.apply(
                p, k, zk, None, mask, xemb, method="loss"
            ).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = q_optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, loss)

        q_params, q_opt_state, q_loss = jax.lax.fori_loop(
            0, q_updates, q_update, (q_params, q_opt_state, jnp.zeros(()))
        )
        recon = jnp.mean((x_hat - x).reshape(b, -1) ** 2)
        return q_params, q_opt_state, {
            "q_loss": q_loss,
            "recon_mse": recon,
            "refine_loss_final": losses[-1],
        }

    return step


def evaluate_inversion(
    key: jax.Array,
    q_params,
    q_model: DAMCAmortizer,
    stylegan_params: Dict,
    images: np.ndarray,
    batch: int = 8,
    steps: int = 100,
    lr: float = 0.01,
    resolution: int = 256,
    compute_dtype=None,
    mesh=None,
    feature_fn=None,
    real_mu=None,
    real_sigma=None,
    fid_metric_name: str = "fid",
) -> Dict[str, float]:
    """Test-set sweep: recon MSE (sum of per-image means / N) + optional FID
    of reconstructions (`eval_stylegan_inv.py:120-152`).

    With `mesh`, each batch shards over the `data` axis (params replicated,
    same program semantics — jax PRNG results don't depend on sharding), so
    the reference's 50k-image eval scales across chips; `batch` must divide
    by the mesh's data-axis size (single-host meshes; the train drivers own
    the multi-host path)."""
    # Params are ARGUMENTS, not closure captures: captured arrays are
    # embedded as literals in the lowered program (313M Q params + StyleGAN
    # weights -> multi-GB MLIR, which overflows remote-compile transports);
    # as arguments the program is ~100 KB and compiles once.
    # One-time placement: converters return host numpy (models/stylegan.py),
    # and numpy jit arguments would re-transfer every call in the loop below.
    # Packed put = one transfer per dtype, not one per leaf (utils/placement).
    from ..utils.placement import device_put_packed

    if mesh is not None:
        from ..parallel import DATA_AXIS, replicated

        n_data = mesh.shape[DATA_AXIS]
        if batch % n_data != 0:
            raise ValueError(
                f"evaluate_inversion: batch {batch} must divide by the "
                f"mesh data axis ({n_data})"
            )
        q_params = device_put_packed(q_params, replicated(mesh))
        stylegan_params = device_put_packed(stylegan_params, replicated(mesh))
    else:
        q_params = device_put_packed(q_params)
        stylegan_params = device_put_packed(stylegan_params)
    run = jax.jit(
        lambda qp, sp, k, xb: invert_batch(
            k, qp, q_model, sp, xb, steps, lr, resolution,
            compute_dtype=compute_dtype,
        )
    )
    total_mse, n = 0.0, 0
    # FID features stream into host Welford stats per batch (2048-d rows)
    # instead of accumulating reconstructed IMAGES: at the reference's
    # 50k x 256^2 x 3 eval protocol the image list would hold ~39 GB of
    # host float32 before the final FID call.
    fid_stats = None
    n_total = len(images)
    if n_total == 0:
        raise ValueError("evaluate_inversion: empty image set")
    # Cover EVERY image like the reference's drop_last=False sweep
    # (`eval_stylegan_inv.py:128-152`): the tail batch is padded (repeating
    # the last image) to keep one compiled shape, then sliced back.
    for i in range(0, n_total, batch):
        xb_real = images[i : i + batch]
        n_real = len(xb_real)
        if n_real < batch:
            pad = np.repeat(np.asarray(xb_real[-1:]), batch - n_real, axis=0)
            xb = jnp.asarray(np.concatenate([np.asarray(xb_real), pad], axis=0))
        else:
            xb = jnp.asarray(xb_real)
        if mesh is not None:
            from ..parallel import shard_batch

            xb = shard_batch(mesh, xb)
        x_hat, z, _ = run(q_params, stylegan_params, jax.random.fold_in(key, i), xb)
        x_hat = x_hat[:n_real]
        total_mse += float(
            jnp.sum(
                jnp.mean(
                    (x_hat - xb[:n_real]).reshape(n_real, -1) ** 2, axis=-1
                )
            )
        )
        n += n_real
        if feature_fn is not None:
            from ..metrics.fid import RunningStats

            feats = np.asarray(feature_fn(to_unit_range(x_hat)))
            if fid_stats is None:
                fid_stats = RunningStats(feats.shape[-1])
            fid_stats.update(feats)
    out = {"recon_mse": total_mse / n}
    if fid_stats is not None and real_mu is not None:
        from ..metrics.fid import frechet_distance

        mu, sigma = fid_stats.finalize()
        out[fid_metric_name] = frechet_distance(mu, sigma, real_mu, real_sigma)
    return out
