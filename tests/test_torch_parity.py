"""Numeric parity of the core DAMC nets against the torch reference oracle.

Random-init the reference modules (`src/diffusion_net.py`), convert their
weights into our Flax param trees (test-only converters below), and compare
outputs. This pins the model family to the reference beyond shape tests.
"""

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
    sys.path.insert(0, os.path.dirname(REF))  # package-style: src.diffusion_net

from damc_tpu.models import LatentDenoiser, LatentEBM, make_encoder  # noqa: E402


def t2j(t):
    return jnp.asarray(np.asarray(t.detach()))


def dense_p(linear):
    p = {"kernel": t2j(linear.weight).T}
    if linear.bias is not None:
        p["bias"] = t2j(linear.bias)
    return p


def convert_csl(csl):
    """torch ConcatSquashLinearSkipCtx -> our ConcatSquashLinear params."""
    return {
        "ctx_kernel": t2j(csl._layer_ctx[1].weight).T,
        "ctx_bias": t2j(csl._layer_ctx[1].bias),
        "_gate": dense_p(csl._hyper_gate),
        "_hyper_bias": dense_p(csl._hyper_bias),
        "_lin": dense_p(csl._layer[0]),
        "_skip": dense_p(csl._skip),
    }


def convert_denoiser(net):
    """torch Diffusion_UnetA -> LatentDenoiser params."""
    p = {
        "fourier_b": t2j(net.B),
        "time_d1": dense_p(net.time_mlp[1]),
        "time_d2": dense_p(net.time_mlp[3]),
    }
    for i, layer in enumerate(net.in_layers):
        p[f"in_layers_{i}"] = convert_csl(layer)
    for i, layer in enumerate(net.mid_layers):
        p[f"mid_layers_{i}"] = convert_csl(layer)
    for i, layer in enumerate(net.out_layers):
        p[f"out_layers_{i}"] = convert_csl(layer)
    return {"params": p}


@pytest.mark.slow
def test_denoiser_parity_with_reference():
    import torch

    from src.diffusion_net import Diffusion_UnetA

    torch.manual_seed(0)
    nz, nxemb, ntemb, nf = 16, 24, 8, 2
    ref = Diffusion_UnetA(nz=nz, nxemb=nxemb, ntemb=ntemb, residual=True, nf=nf)
    ref.eval()

    mine = LatentDenoiser(nz=nz, nxemb=nxemb, ntemb=ntemb, nf=nf, residual=True)
    params = convert_denoiser(ref)

    rng = np.random.RandomState(1)
    z = rng.randn(5, nz).astype(np.float32)
    logsnr = rng.uniform(-5, 9, size=(5,)).astype(np.float32)
    xemb = rng.randn(5, nxemb).astype(np.float32)

    with torch.no_grad():
        expected = ref(
            z=torch.from_numpy(z),
            logsnr=torch.from_numpy(logsnr),
            xemb=torch.from_numpy(xemb),
        ).numpy()
    got = mine.apply(params, jnp.asarray(z), jnp.asarray(logsnr), jnp.asarray(xemb))
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)

    # structural sanity: converted tree matches an init tree leaf-for-leaf
    init = mine.init(jax.random.PRNGKey(0), jnp.asarray(z), jnp.asarray(logsnr), jnp.asarray(xemb))
    ref_shapes = jax.tree.map(lambda a: a.shape, params)
    init_shapes = jax.tree.map(lambda a: a.shape, init)
    assert ref_shapes == init_shapes


@pytest.mark.slow
def test_ebm_parity_with_reference():
    import torch

    from src.diffusion_net import _netE

    torch.manual_seed(2)
    ref = _netE(nz=12, ndf=20)
    ref.eval()
    params = {
        "params": {
            "Dense_0": dense_p(ref.ebm[0]),
            "Dense_1": dense_p(ref.ebm[2]),
            "Dense_2": dense_p(ref.ebm[4]),
        }
    }
    mine = LatentEBM(ndf=20)
    z = np.random.RandomState(3).randn(7, 12).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(z)).numpy()
    got = mine.apply(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


@pytest.mark.slow
def test_prior_embedder_parity_with_reference():
    """The prior-embedding MLP uses torch's DEFAULT LeakyReLU slope 0.01
    (`diffusion_net.py:577-581`), unlike the 0.2 used elsewhere — pin it."""
    import torch

    from src.diffusion_net import _netQ_U  # noqa: F401  (for the Sequential spec)

    nz, nxemb = 6, 10
    torch.manual_seed(5)
    ref = torch.nn.Sequential(
        torch.nn.Linear(nz, 128), torch.nn.LeakyReLU(), torch.nn.Linear(128, nxemb)
    )
    ref.eval()

    from damc_tpu.models.amortizer import PriorEmbedder

    mine = PriorEmbedder(nxemb=nxemb)
    params = {
        "params": {
            "Dense_0": dense_p(ref[0]),
            "Dense_1": dense_p(ref[2]),
        }
    }
    noise = np.random.RandomState(6).randn(4, nz).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(noise)).numpy()
    got = mine.apply(params, jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


@pytest.mark.slow
def test_encoder_parity_with_reference():
    import torch

    from src.diffusion_net import Encoder_cifar10

    torch.manual_seed(4)
    nemb, nif = 10, 4
    ref = Encoder_cifar10(nc=3, nemb=nemb, nif=nif)
    ref.eval()

    mine = make_encoder("cifar10", nemb=nemb, nif=nif)
    # torch Sequential: conv at 0,3,6,9,12; InstanceNorm at 1,4,7,10.
    convs = [ref.net[i] for i in (0, 3, 6, 9, 12)]
    norms = [ref.net[i] for i in (1, 4, 7, 10)]
    p = {}
    for i, conv in enumerate(convs):
        p[f"Conv_{i}"] = {
            "kernel": t2j(conv.weight).transpose(2, 3, 1, 0),
            "bias": t2j(conv.bias),
        }
    for i, norm in enumerate(norms):
        p[f"GroupNorm_{i}"] = {"scale": t2j(norm.weight), "bias": t2j(norm.bias)}
    params = {"params": p}

    x = np.random.RandomState(5).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected, atol=3e-5)
