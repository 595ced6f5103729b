"""End-to-end StyleGAN inversion pipeline test at res 32 (random weights via
the torch reference oracle)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/workspace/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference oracle not available"
)
if os.path.isdir(REF):
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def stylegan_params32():
    import torch

    from stylegan.perceptual_model import VGG16
    from stylegan.stylegan_encoder_network import StyleGANEncoderNet
    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    from damc_tpu.models.stylegan import (
        convert_encoder_state_dict,
        convert_generator_state_dict,
        convert_vgg16_state_dict,
    )

    torch.manual_seed(0)
    gen = StyleGANGeneratorNet(resolution=32, repeat_w=False, final_tanh=True)
    enc = StyleGANEncoderNet(resolution=32, use_wscale=False, use_bn=True)
    vgg = VGG16()
    return {
        "generator": convert_generator_state_dict(gen.state_dict(), 32),
        "encoder": convert_encoder_state_dict(enc.state_dict(), 32),
        "vgg": convert_vgg16_state_dict(vgg.state_dict()),
    }


@pytest.mark.slow
def test_invert_batch_runs_and_improves(stylegan_params32):
    import dataclasses

    from damc_tpu.train.stylegan_inv import invert_batch, make_stylegan_amortizer
    from damc_tpu.utils import preset

    cfg = preset("cifar10")
    cfg = dataclasses.replace(
        cfg, diffusion=dataclasses.replace(cfg.diffusion, n_interval=3)
    )
    q_model = make_stylegan_amortizer(cfg, resolution=32)
    assert q_model.nz == 8 * 512  # num_layers(32) * 512

    xemb_dummy = jnp.zeros((1, q_model.nz))
    q_params = q_model.init(jax.random.PRNGKey(0), xemb_dummy)

    x = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    )
    x_hat, z, losses = invert_batch(
        jax.random.PRNGKey(1),
        q_params,
        q_model,
        stylegan_params32,
        x,
        steps=20,
        lr=0.05,
        resolution=32,
    )
    assert x_hat.shape == (2, 32, 32, 3)
    assert z.shape == (2, q_model.nz)
    assert np.all(np.isfinite(np.asarray(x_hat)))
    # Adam refinement must reduce the inversion loss.
    assert float(losses[-1]) < float(losses[0])


@pytest.mark.slow
def test_nan_rescue_replaces_bad_rows(stylegan_params32):
    from damc_tpu.train.stylegan_inv import nan_rescue

    gen = stylegan_params32["generator"]
    nz = 8 * 512
    z = jnp.concatenate(
        [jnp.full((1, nz), jnp.nan), jnp.zeros((1, nz))], axis=0
    )
    x = jnp.zeros((2, 32, 32, 3))
    out = nan_rescue(jax.random.PRNGKey(0), gen, z, x, resolution=32)
    assert np.all(np.isfinite(np.asarray(out[0])))  # rescued
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)  # untouched


def test_invert_batch_bf16_quality_parity(stylegan_params32):
    """The bf16 compute path of the Adam refinement must track the f32 path:
    same inputs, same step count -> final recon MSE within a few percent and
    the loss still decreasing. (Adam state, z, and loss reductions stay f32;
    only the synthesis/VGG forwards+input-backwards run in bf16.)"""
    import dataclasses

    from damc_tpu.train.stylegan_inv import invert_batch, make_stylegan_amortizer
    from damc_tpu.utils import preset

    cfg = preset("cifar10")
    cfg = dataclasses.replace(
        cfg, diffusion=dataclasses.replace(cfg.diffusion, n_interval=3)
    )
    q_model = make_stylegan_amortizer(cfg, resolution=32)
    q_params = q_model.init(jax.random.PRNGKey(0), jnp.zeros((1, q_model.nz)))
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    )

    outs = {}
    for dtype in (None, jnp.bfloat16):
        x_hat, z, losses = invert_batch(
            jax.random.PRNGKey(1), q_params, q_model, stylegan_params32, x,
            steps=20, lr=0.05, resolution=32, compute_dtype=dtype,
        )
        assert np.all(np.isfinite(np.asarray(x_hat)))
        assert float(losses[-1]) < float(losses[0])
        outs[dtype is None] = (np.asarray(x_hat), np.asarray(losses))

    mse_f32 = float(np.mean((outs[True][0] - np.asarray(x)) ** 2))
    mse_bf16 = float(np.mean((outs[False][0] - np.asarray(x)) ** 2))
    assert abs(mse_bf16 - mse_f32) / mse_f32 < 0.05, (mse_f32, mse_bf16)
    # final losses agree too (z stays f32; only activation rounding differs)
    assert abs(outs[False][1][-1] - outs[True][1][-1]) / outs[True][1][-1] < 0.05
