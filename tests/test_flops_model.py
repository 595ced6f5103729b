"""Validate the analytic FLOPs model against XLA's own cost analysis.

XLA cost_analysis counts a lax.scan body once (not x trip-count), so it
CANNOT audit the full sampling phase — but it is exact on un-scanned single
applies. Each model component's analytic forward count must match XLA's
conv/dot FLOPs within tolerance (XLA additionally counts elementwise work
and exact edge clipping, so bounds are one-sided-ish but kept loose).
"""

import jax
import jax.numpy as jnp
import pytest

from damc_tpu.models.ebm import LatentEBM
from damc_tpu.models.encoders import make_encoder
from damc_tpu.models.generators import make_generator
from damc_tpu.utils.flops import (
    ebm_fwd_flops,
    encoder_fwd_flops,
    generator_fwd_flops,
    sampling_phase_flops,
)

B = 8


def xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


def rel_err(a, b):
    return abs(a - b) / max(abs(b), 1e-9)


@pytest.mark.parametrize("dataset,ngf,nz", [("cifar10", 128, 128), ("svhn", 64, 100)])
def test_generator_fwd_matches_xla(dataset, ngf, nz):
    g = make_generator(dataset, ngf, 3)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((B, nz)))
    got = xla_flops(lambda p, z: g.apply(p, z), params, jnp.zeros((B, nz)))
    want = B * generator_fwd_flops(dataset, ngf, 3, nz)
    # ConvTranspose edge clipping means analytic >= XLA; elementwise adds a
    # little back. Within 15%.
    assert rel_err(got, want) < 0.15, (got, want)


def test_encoder_fwd_matches_xla():
    enc = make_encoder("cifar10", 1024, 64)
    x = jnp.zeros((B, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    got = xla_flops(lambda p, xx: enc.apply(p, xx), params, x)
    want = B * encoder_fwd_flops("cifar10", 1024, 64, 32)
    assert rel_err(got, want) < 0.15, (got, want)


def test_ebm_fwd_matches_xla():
    e = LatentEBM(ndf=200)
    z = jnp.zeros((B, 128))
    params = e.init(jax.random.PRNGKey(0), z)
    got = xla_flops(lambda p, zz: e.apply(p, zz), params, z)
    want = B * ebm_fwd_flops(128, 200)
    assert rel_err(got, want) < 0.10, (got, want)


def test_denoiser_eval_matches_xla():
    """The per-eval count on the hoisted sampling path (denoise_from_tables)
    must cover ALL FOUR matmuls per ConcatSquashLinear (_lin, _skip, FiLM
    _gate, _hyper_bias) plus the fourier projection — the round-3 review
    found the original model omitted 3 of the 4 (a ~3.5x undercount)."""
    from damc_tpu.models.denoiser import LatentDenoiser
    from damc_tpu.utils.flops import denoiser_fwd_flops

    nz, nxemb, ntemb, nf = 128, 1024, 128, 4
    den = LatentDenoiser(nz=nz, nxemb=nxemb, ntemb=ntemb, nf=nf)
    z = jnp.zeros((B, nz))
    grid = jnp.linspace(-5.0, 5.0, 4)
    xemb = jnp.zeros((B, nxemb))
    params = den.init(jax.random.PRNGKey(0), z, jnp.zeros((B,)), xemb)
    tables = den.apply(
        params, grid, xemb, method=lambda m, g, e: m.sample_tables(g, e)
    )
    pre_t_step = [t[0] for t in tables["pre_t"]]

    def one_eval(p, zz, ts, xs):
        return den.apply(
            p, zz, ts, xs, method=lambda m, a, b, c: m.denoise_from_tables(a, b, c)
        )

    got = xla_flops(one_eval, params, z, pre_t_step, tables["pre_x"])
    want = B * denoiser_fwd_flops(nz, nxemb, ntemb, nf)
    assert rel_err(got, want) < 0.15, (got, want)


def test_grad_costs_twice_forward():
    """The model charges fwd + input-bwd = 2x fwd for grad-z of G; XLA's
    count of the same grad program agrees (weight grads are sliced away by
    stop_gradient + closure, leaving fwd + transposed convs)."""
    g = make_generator("cifar10", 128, 3)
    z = jnp.zeros((B, 128))
    params = g.init(jax.random.PRNGKey(0), z)
    x = jnp.zeros((B, 32, 32, 3))

    def energy(zz):
        sg = jax.lax.stop_gradient(params)
        return jnp.sum((g.apply(sg, zz) - x) ** 2)

    got = xla_flops(jax.grad(energy), z)
    want = B * 2.0 * generator_fwd_flops("cifar10", 128, 3, 128)
    assert rel_err(got, want) < 0.25, (got, want)


def test_phase_total_dominated_by_posterior():
    """Structural sanity at the cifar10 preset: the posterior Langevin conv
    chain carries ~95% of the phase FLOPs (the basis of the perf story in
    bench.py — small-kernel sweep + MLP prior are not the wall)."""
    from damc_tpu.utils.config import preset

    f = sampling_phase_flops(preset("cifar10"), batch=128)
    assert f["posterior"] / f["total"] > 0.9
    # Scale check against the hand number in bench.py's docstring era:
    # ~2.2 GFLOP per G forward at ngf=128.
    assert 1.8e9 < f["generator_fwd_per_image"] < 2.6e9


# ---------------------------------------------------------------------------
# StyleGAN inversion components (utils/flops.py round-3 additions)
# ---------------------------------------------------------------------------


def _torch_sg():
    import sys

    sys.path.insert(0, "/root/reference/workspace/src")
    import torch

    torch.manual_seed(0)
    return torch


def test_stylegan_synthesis_flops_matches_xla_res32():
    """Unfused-branch counting (res < 128) vs XLA at res 32."""
    from damc_tpu.models.stylegan import convert_generator_state_dict, generator_apply
    from damc_tpu.utils.flops import stylegan_synthesis_fwd_flops

    _torch_sg()
    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    net = StyleGANGeneratorNet(resolution=32, repeat_w=False, final_tanh=True)
    params = convert_generator_state_dict(net.state_dict(), resolution=32)
    z = jnp.zeros((B, 8 * 512))
    got = xla_flops(lambda p, zz: generator_apply(p, zz, resolution=32), params, z)
    want = B * stylegan_synthesis_fwd_flops(32)
    # XLA DCE removes the dead per-res toRGBs exactly as the model assumes;
    # remaining gap is elementwise noise/norm work.
    assert rel_err(got, want) < 0.15, (got, want)


def test_stylegan_encoder_flops_matches_xla_res32():
    from damc_tpu.models.stylegan import convert_encoder_state_dict, encoder_apply
    from damc_tpu.utils.flops import stylegan_encoder_fwd_flops

    _torch_sg()
    from stylegan.stylegan_encoder_network import StyleGANEncoderNet

    net = StyleGANEncoderNet(resolution=32, use_wscale=False, use_bn=True)
    params = convert_encoder_state_dict(net.state_dict(), resolution=32)
    x = jnp.zeros((B, 32, 32, 3))
    got = xla_flops(lambda p, xx: encoder_apply(p, xx, resolution=32), params, x)
    want = B * stylegan_encoder_fwd_flops(32)
    assert rel_err(got, want) < 0.15, (got, want)


def test_vgg16_flops_matches_xla():
    from damc_tpu.models.stylegan import convert_vgg16_state_dict, vgg16_features
    from damc_tpu.utils.flops import vgg16_fwd_flops

    _torch_sg()
    from stylegan.perceptual_model import VGG16

    params = convert_vgg16_state_dict(VGG16().state_dict())
    x = jnp.zeros((B, 64, 64, 3))
    got = xla_flops(lambda p, xx: vgg16_features(p, xx), params, x)
    want = B * vgg16_fwd_flops(64)
    assert rel_err(got, want) < 0.10, (got, want)


@pytest.mark.slow
def test_stylegan_synthesis_flops_matches_xla_res256():
    """Fused-branch counting (conv_transpose fold at res >= 128) vs XLA at
    the flagship resolution."""
    from damc_tpu.models.stylegan import convert_generator_state_dict, generator_apply
    from damc_tpu.utils.flops import stylegan_synthesis_fwd_flops

    _torch_sg()
    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    net = StyleGANGeneratorNet(resolution=256, repeat_w=False, final_tanh=True)
    params = convert_generator_state_dict(net.state_dict(), resolution=256)
    z = jnp.zeros((2, 14 * 512))
    got = xla_flops(lambda p, zz: generator_apply(p, zz, resolution=256), params, z)
    want = 2 * stylegan_synthesis_fwd_flops(256)
    assert rel_err(got, want) < 0.15, (got, want)


def test_train_step_flops_structure():
    """train_step_flops (round-5 full-step MFU numerator): components are
    positive, sum to the total, and respect the workload structure knobs
    (anomaly single chains + dual-branch Q loss; toy no E/G updates)."""
    from damc_tpu.utils.config import preset
    from damc_tpu.utils.flops import sampling_phase_flops, train_step_flops

    cfg = preset("cifar10")
    fl = train_step_flops(cfg, 128)
    parts = ("sampling_phase", "q_updates", "g_update", "e_update")
    assert all(fl[k] > 0 for k in parts), fl
    assert abs(sum(fl[k] for k in parts) - fl["total"]) < 1e-6 * fl["total"]
    assert fl["sampling_phase"] == sampling_phase_flops(cfg, 128)["total"]

    # anomaly: single prior chains (E update over 2B rows, not 3B) and the
    # dual-branch Q loss doubles the Q-update work per inner update
    an = preset("mnist_anomaly")
    fa = train_step_flops(an, 128)
    e_fwd = fa["ebm_fwd_per_sample"]
    assert fa["e_update"] == 3.0 * 2 * 128 * e_fwd
    import dataclasses

    an1 = dataclasses.replace(
        an, train=dataclasses.replace(an.train, q_loss_both_branches=False)
    )
    assert abs(
        train_step_flops(an1, 128)["q_updates"] * 2 - fa["q_updates"]
    ) < 1e-6 * fa["q_updates"]

    # toy: no EBM/no G update -> e_update 0, g monitor fwd only
    toy = preset("toy")
    ft = train_step_flops(toy, 500)
    assert ft["e_update"] == 0.0
    assert ft["g_update"] == 500 * ft["generator_fwd_per_image"]


def test_sampling_phase_flops_prior_chain_structure():
    """The phase model honors prior_chains: 2B gen_recon vs B anomaly vs
    0 toy (round-5 generalization; was hardcoded 'double')."""
    import dataclasses

    from damc_tpu.utils.config import preset
    from damc_tpu.utils.flops import sampling_phase_flops

    cfg = preset("cifar10")
    double = sampling_phase_flops(cfg, 64)["prior"]
    single = sampling_phase_flops(
        dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, prior_chains="single")
        ),
        64,
    )["prior"]
    assert abs(double - 2 * single) < 1e-6 * double
    assert sampling_phase_flops(preset("toy"), 64)["prior"] == 0.0

    # remat_generator recomputes the G forward inside the posterior bwd
    remat = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat_generator=True)
    )
    base = sampling_phase_flops(cfg, 64)
    with_remat = sampling_phase_flops(remat, 64)
    extra = 64 * cfg.mcmc.g_l_steps * base["generator_fwd_per_image"]
    assert abs(
        (with_remat["posterior"] - base["posterior"]) - extra
    ) < 1e-6 * extra
