"""StyleGAN stack parity tests against the torch reference (used as a
read-only numeric oracle: random-init the reference modules, convert their
state_dict with our converters, and compare outputs)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp
import jax  # noqa: E402

REF = "/root/reference/workspace/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference oracle not available"
)

if os.path.isdir(REF):
    sys.path.insert(0, REF)

from damc_tpu.models.stylegan import (  # noqa: E402
    convert_encoder_state_dict,
    convert_generator_state_dict,
    convert_vgg16_state_dict,
    encoder_apply,
    generator_apply,
    mapping_apply,
    num_synthesis_layers,
    sample_w_codes,
    truncation_apply,
    vgg16_features,
)


def to_nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def torch_gen32():
    import torch

    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    torch.manual_seed(0)
    net = StyleGANGeneratorNet(
        resolution=32,
        repeat_w=False,
        final_tanh=True,
        truncation_psi=0.7,
        truncation_layers=8,
        randomize_noise=False,
    )
    net.eval()
    # Give the zero-init noise weights / w_avg nonzero values so the test
    # actually exercises those paths.
    sd = net.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if "apply_noise.weight" in k or k == "truncation.w_avg":
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    net.load_state_dict(sd)
    return net


@pytest.mark.slow
def test_generator_synthesis_parity_res32(torch_gen32):
    import torch

    net = torch_gen32
    params = convert_generator_state_dict(net.state_dict(), resolution=32)
    n_layers = num_synthesis_layers(32)
    rng = np.random.RandomState(0)
    wp_flat = rng.randn(2, n_layers * 512).astype(np.float32)

    with torch.no_grad():
        # net was built with final_tanh=True, so synthesis already applies it
        ref = net.synthesis(torch.from_numpy(wp_flat).view(2, n_layers, 512))
    mine = generator_apply(params, jnp.asarray(wp_flat), resolution=32)
    np.testing.assert_allclose(np.asarray(mine), to_nhwc(ref), atol=5e-3)


@pytest.mark.slow
def test_mapping_and_truncation_parity(torch_gen32):
    import torch

    net = torch_gen32
    params = convert_generator_state_dict(net.state_dict(), resolution=32)
    z = np.random.RandomState(1).randn(3, 512).astype(np.float32)
    with torch.no_grad():
        w_ref = net.mapping(torch.from_numpy(z), l=None)
        wp_ref = net.truncation(w_ref)
    w = mapping_apply(params["mapping"], jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(w), w_ref.numpy(), atol=2e-5)
    wp = truncation_apply(params["truncation"], w, resolution=32)
    np.testing.assert_allclose(np.asarray(wp), wp_ref.numpy(), atol=2e-5)


@pytest.mark.slow
def test_fused_upconv_block_parity():
    """The conv-transpose padded-kernel fold (res >= 128 blocks), tested in
    isolation against the torch block at tiny channel counts."""
    import torch

    from stylegan.stylegan_generator_network import UpConvBlock

    torch.manual_seed(2)
    blk = UpConvBlock(
        resolution=8, in_channels=6, out_channels=4, fused_scale=True,
        w_space_dim=512, randomize_noise=False,
    )
    blk.eval()
    sd = blk.state_dict()
    sd["epilogue.apply_noise.weight"] = torch.randn(4) * 0.1
    blk.load_state_dict(sd)

    x = np.random.RandomState(3).randn(2, 6, 4, 4).astype(np.float32)
    w = np.random.RandomState(4).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        ref = blk(torch.from_numpy(x), torch.from_numpy(w))

    from damc_tpu.models.stylegan import _up_conv_block

    p = {
        "weight": jnp.asarray(sd["weight"].numpy()),
        "epilogue": {
            "noise": jnp.asarray(sd["epilogue.apply_noise.noise"].numpy()[0, 0]),
            "noise_weight": jnp.asarray(sd["epilogue.apply_noise.weight"].numpy()),
            "bias": jnp.asarray(sd["epilogue.bias"].numpy()),
            "style_mod": {
                "dense": {
                    "weight": jnp.asarray(sd["epilogue.style_mod.dense.fc.weight"].numpy()),
                    "bias": jnp.asarray(sd["epilogue.style_mod.dense.wscale.bias"].numpy()),
                }
            },
        },
    }
    mine = _up_conv_block(
        p, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w), fused=True
    )
    np.testing.assert_allclose(np.asarray(mine), to_nhwc(ref), atol=1e-4)


@pytest.mark.slow
def test_encoder_parity_res32():
    import torch

    from stylegan.stylegan_encoder_network import StyleGANEncoderNet

    torch.manual_seed(5)
    net = StyleGANEncoderNet(resolution=32, use_wscale=False, use_bn=True)
    net.eval()
    # randomize BN running stats so inference-mode normalization is exercised
    sd = net.state_dict()
    g = torch.Generator().manual_seed(6)
    for k, v in sd.items():
        if "running_mean" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        if "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    net.load_state_dict(sd)

    params = convert_encoder_state_dict(net.state_dict(), resolution=32)
    x = np.random.RandomState(7).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
    mine = encoder_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), resolution=32)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=3e-4)


@pytest.mark.slow
def test_vgg16_parity():
    import torch

    from stylegan.perceptual_model import VGG16

    torch.manual_seed(8)
    net = VGG16()
    net.eval()
    params = convert_vgg16_state_dict(net.state_dict())
    x = np.random.RandomState(9).rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = net(torch.from_numpy(x))
    mine = vgg16_features(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(mine), to_nhwc(ref), atol=2e-2, rtol=1e-4)


def test_sample_w_codes_shape(torch_gen32):
    params = convert_generator_state_dict(torch_gen32.state_dict(), resolution=32)
    codes = sample_w_codes(params, jax.random.PRNGKey(0), b=2, resolution=32)
    assert codes.shape == (2, num_synthesis_layers(32) * 512)


@pytest.mark.slow
def test_generator_synthesis_parity_res256_full_size():
    """Flagship-size parity: the COMPLETE res-256 synthesis stack (fused
    upconv blocks at high resolutions, every per-res toRGB head, lod skip
    wiring) vs the torch reference with shared random weights. Round-1
    coverage stopped at res 32, which never exercises the fused path in
    context."""
    import torch

    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    torch.manual_seed(2)
    net = StyleGANGeneratorNet(
        resolution=256, repeat_w=False, final_tanh=True,
        truncation_psi=0.7, truncation_layers=8, randomize_noise=False,
    )
    net.eval()
    sd = net.state_dict()
    g = torch.Generator().manual_seed(3)
    for k, v in sd.items():
        if "apply_noise.weight" in k or k == "truncation.w_avg":
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    net.load_state_dict(sd)

    params = convert_generator_state_dict(net.state_dict(), resolution=256)
    n_layers = num_synthesis_layers(256)
    wp_flat = np.random.RandomState(4).randn(1, n_layers * 512).astype(np.float32)

    with torch.no_grad():
        ref = net.synthesis(torch.from_numpy(wp_flat).view(1, n_layers, 512))
    mine = generator_apply(params, jnp.asarray(wp_flat), resolution=256)
    assert mine.shape == (1, 256, 256, 3)
    np.testing.assert_allclose(np.asarray(mine), to_nhwc(ref), atol=5e-3)


@pytest.mark.slow
def test_encoder_parity_res256_full_size():
    """Full-size inversion encoder (image -> 7168-d W+) vs torch."""
    import torch

    from stylegan.stylegan_encoder_network import StyleGANEncoderNet

    torch.manual_seed(5)
    net = StyleGANEncoderNet(resolution=256, use_wscale=False, use_bn=True)
    net.eval()
    # Non-trivial BN statistics so folding is actually exercised.
    sd = net.state_dict()
    g = torch.Generator().manual_seed(6)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    net.load_state_dict(sd)

    params = convert_encoder_state_dict(net.state_dict(), resolution=256)
    x = np.random.RandomState(7).uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).reshape(1, -1).numpy()
    mine = encoder_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), resolution=256)
    assert mine.shape == (1, 7168)
    np.testing.assert_allclose(np.asarray(mine), ref, atol=3e-3, rtol=1e-3)
