"""Full-size StyleGAN-inversion validation on TPU hardware.

Runs the flagship inversion config — resolution 256, nz = 7168, 100-step
amortized reverse sweep + 100-step Adam refinement with VGG perceptual loss
— as ONE jitted program on the real chip. Round 1 could not compile this:
params were closed over and embedded as program literals (313M Q params ->
multi-GB MLIR -> remote-compile HTTP 413). With params as jit arguments the
program is ~100 KB.

Weights are random (converted from torch reference modules at random init —
no pretrained checkpoints exist in this image); the run validates compile +
execution + numerics (finite outputs, Adam loss decreasing), not inversion
quality. Usage:  python tools/validate_stylegan_fullsize_tpu.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "/root/reference/workspace/src")

import jax
import jax.numpy as jnp


def force_sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main():
    from damc_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    assert jax.devices()[0].platform != "cpu", "needs a real TPU"

    import torch

    from stylegan.perceptual_model import VGG16
    from stylegan.stylegan_encoder_network import StyleGANEncoderNet
    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    from damc_tpu.models.stylegan import (
        convert_encoder_state_dict,
        convert_generator_state_dict,
        convert_vgg16_state_dict,
    )
    from damc_tpu.train.stylegan_inv import invert_batch, make_stylegan_amortizer
    from damc_tpu.utils.config import preset

    res = 256
    torch.manual_seed(0)
    print("building + converting torch nets at res 256...", flush=True)
    gen = StyleGANGeneratorNet(resolution=res, repeat_w=False, final_tanh=True)
    enc = StyleGANEncoderNet(resolution=res, use_wscale=False, use_bn=True)
    vgg = VGG16()
    sp = {
        "generator": convert_generator_state_dict(gen.state_dict(), res),
        "encoder": convert_encoder_state_dict(enc.state_dict(), res),
        "vgg": convert_vgg16_state_dict(vgg.state_dict()),
    }
    from damc_tpu.utils.placement import device_put_packed

    sp = device_put_packed(sp)  # converters return host numpy; place once
    del gen, enc, vgg

    cfg = preset("celebaHQ")
    q_model = make_stylegan_amortizer(cfg, resolution=res)
    assert q_model.nz == 7168, q_model.nz
    print(f"initializing Q (nz={q_model.nz}, n_interval={cfg.diffusion.n_interval})...", flush=True)
    xemb_dummy = jnp.zeros((1, q_model.nz))
    qp = q_model.init(jax.random.PRNGKey(0), xemb_dummy)
    n_q = sum(x.size for x in jax.tree.leaves(qp))
    print(f"Q params: {n_q/1e6:.1f}M", flush=True)

    B, steps = 4, 100
    run = jax.jit(
        lambda qpp, spp, k, xb: invert_batch(
            k, qpp, q_model, spp, xb, steps=steps, lr=0.01, resolution=res
        )
    )
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, res, res, 3), minval=-1.0, maxval=1.0)

    lo = run.lower(qp, sp, jax.random.PRNGKey(2), x)
    print(f"lowered MLIR bytes: {len(lo.as_text())}", flush=True)

    print("compiling + running on TPU...", flush=True)
    t0 = time.perf_counter()
    x_hat, z, losses = run(qp, sp, jax.random.PRNGKey(2), x)
    force_sync(x_hat)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    x_hat, z, losses = run(qp, sp, jax.random.PRNGKey(4), x)
    force_sync(x_hat)
    t_steady = time.perf_counter() - t0

    losses = np.asarray(losses)
    assert np.all(np.isfinite(np.asarray(x_hat))), "non-finite reconstruction"
    assert np.all(np.isfinite(np.asarray(z))), "non-finite latents"
    assert z.shape == (B, 7168)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    print(
        f"OK: B={B} res={res} nz=7168, {cfg.diffusion.n_interval}-step Q sweep"
        f" + {steps}-step Adam refine. first-call {t_first:.1f}s (compile),"
        f" steady {t_steady*1000:.0f} ms/batch."
        f" adam loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True,
    )


if __name__ == "__main__":
    main()
