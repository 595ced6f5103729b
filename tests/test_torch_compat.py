"""Checkpoint-migration tests: full reference models convert with exact
numerical parity (generator deconv stacks incl. the spatial-flip mapping,
and the complete amortizer Q)."""

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
    sys.path.insert(0, os.path.dirname(REF))

from damc_tpu.models import make_generator  # noqa: E402
from damc_tpu.utils.torch_compat import (  # noqa: E402
    convert_amortizer,
    convert_ebm,
    convert_generator,
)


GEN_CASES = [
    ("cifar10", "_netG_cifar10", dict(nz=16, ngf=4, nc=3)),
    ("svhn", "_netG_svhn", dict(nz=16, ngf=4, nc=3)),
    ("celeba64", "_netG_celeba64", dict(nz=16, ngf=4, nc=3)),
    ("mnist", "_netG_mnist", dict(nz=16, ngf=4, nc=1)),
]


@pytest.mark.slow
@pytest.mark.parametrize("dataset,cls,kw", GEN_CASES)
def test_generator_conversion_parity(dataset, cls, kw):
    import torch

    import src.diffusion_net as dn

    torch.manual_seed(0)
    ref = getattr(dn, cls)(**kw)
    ref.eval()

    mine = make_generator(dataset, ngf=kw["ngf"], nc=kw["nc"])
    params = convert_generator(ref.state_dict())

    z = np.random.RandomState(1).randn(2, kw["nz"]).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(z)).numpy()
    got = mine.apply(params, jnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), expected, atol=3e-6
    )


@pytest.mark.slow
def test_full_amortizer_conversion_parity():
    """Converted Q must reproduce the reference denoiser output with the
    reference's own encoder embedding — the complete conditional eps-path."""
    import torch

    from src.diffusion_net import _netQ_U

    torch.manual_seed(1)
    ref = _netQ_U(
        nc=3, nz=8, nxemb=12, ntemb=8, nf=2, nif=4,
        diffusion_residual=True, n_interval=4,
        logsnr_min=-5.1, logsnr_max=9.8, var_type="large",
        with_noise=True, dataset="cifar10",
    )
    ref.eval()

    from damc_tpu.models import DAMCAmortizer

    mine = DAMCAmortizer(
        nz=8, nxemb=12, ntemb=8, nf=2, nif=4, nc=3, dataset="cifar10",
        n_interval=4, logsnr_min=-5.1, logsnr_max=9.8, var_type="large",
        with_noise=True, residual=True,
    )
    params = convert_amortizer(ref.state_dict(), "cifar10")

    rng = np.random.RandomState(2)
    x = rng.randn(3, 3, 32, 32).astype(np.float32)
    z = rng.randn(3, 8).astype(np.float32)
    logsnr = rng.uniform(-5, 9, (3,)).astype(np.float32)
    noise = rng.randn(3, 8).astype(np.float32)

    with torch.no_grad():
        xemb_ref = ref.encoder(torch.from_numpy(x)).numpy()
        eps_ref = ref.p(
            z=torch.from_numpy(z),
            logsnr=torch.from_numpy(logsnr),
            xemb=torch.from_numpy(xemb_ref),
        ).numpy()
        prior_ref = ref.prior_emb(torch.from_numpy(noise)).numpy()

    xemb = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), method="encode")
    np.testing.assert_allclose(np.asarray(xemb), xemb_ref, atol=2e-5)

    eps = mine.apply(
        params, jnp.asarray(z), jnp.asarray(logsnr), jnp.asarray(xemb), method="denoise"
    )
    np.testing.assert_allclose(np.asarray(eps), eps_ref, atol=2e-5)

    prior = mine.apply(params, jnp.asarray(noise), method="prior_embed")
    np.testing.assert_allclose(np.asarray(prior), prior_ref, atol=1e-5)

    # converted tree is structurally identical to a fresh init
    init = mine.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(
        lambda a: a.shape, init
    )


@pytest.mark.slow
def test_ebm_conversion_roundtrip():
    import torch

    from src.diffusion_net import _netE

    torch.manual_seed(3)
    ref = _netE(nz=8, ndf=16)
    from damc_tpu.models import LatentEBM

    mine = LatentEBM(ndf=16)
    params = convert_ebm(ref.state_dict())
    z = np.random.RandomState(4).randn(5, 8).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(z)).numpy()
    got = mine.apply(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)
