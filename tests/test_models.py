"""Shape/parity tests for the model zoo against the reference architecture table.

Spatial shapes must match the torch stacks exactly (SURVEY.md §2.2); init
distributions follow torch defaults (U(+-1/sqrt(fan_in))).
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from damc_tpu.models import (
    DAMCAmortizer,
    LatentDenoiser,
    LatentEBM,
    MLPEncoder,
    ToyGenerator,
    make_encoder,
    make_generator,
)

KEY = jax.random.PRNGKey(0)


GEN_CASES = [
    # dataset, nz, ngf, nc, expected (H, W, C)
    ("cifar10", 128, 128, 3, (32, 32, 3)),
    ("svhn", 100, 64, 3, (32, 32, 3)),
    ("celeba64", 100, 128, 3, (64, 64, 3)),
    ("mnist", 100, 16, 1, (28, 28, 1)),
]


@pytest.mark.parametrize("dataset,nz,ngf,nc,expected", GEN_CASES)
def test_generator_output_shapes(dataset, nz, ngf, nc, expected):
    g = make_generator(dataset, ngf=ngf, nc=nc)
    z = jnp.zeros((2, nz))
    params = g.init(KEY, z)
    x = g.apply(params, z)
    assert x.shape == (2, *expected)
    assert float(jnp.max(jnp.abs(x))) <= 1.0  # tanh range


@pytest.mark.slow
def test_generator_celebahq_shape():
    g = make_generator("celebaHQ", ngf=16, nc=3)
    z = jnp.zeros((1, 128))
    params = g.init(KEY, z)
    assert g.apply(params, z).shape == (1, 256, 256, 3)


PHASE_CASES = [
    # dataset, nz, ngf, nc — reduced widths; covers every layer shape family
    # (VALID k8/k4/k7 first layers, k4/s2 SAME upsamplers, k3/s1 SAME tails)
    ("cifar10", 16, 8, 3),
    ("svhn", 12, 8, 3),
    ("celeba64", 12, 8, 3),
    ("celebaHQ", 16, 8, 3),
    ("mnist", 12, 8, 1),
]


@pytest.mark.parametrize("dataset,nz,ngf,nc", PHASE_CASES)
def test_phase_deconv_matches_conv_transpose(dataset, nz, ngf, nc):
    """impl='phase' is the same math on the same param tree: forward and
    grad-z equality with the lax.conv_transpose implementation (the phase
    path reassociates each output sum, so ~1e-6 relative, not bitwise)."""
    g_ct = make_generator(dataset, ngf=ngf, nc=nc)
    g_ph = make_generator(dataset, ngf=ngf, nc=nc, impl="phase")
    z = jax.random.normal(jax.random.PRNGKey(3), (4, nz))
    params = g_ct.init(KEY, z)
    # identical parameter tree: phase params load the conv_transpose init as-is
    chex.assert_trees_all_equal_shapes(params, g_ph.init(KEY, z))

    ya, yb = g_ct.apply(params, z), g_ph.apply(params, z)
    np.testing.assert_allclose(ya, yb, atol=5e-6, rtol=1e-5)

    def loss(impl_g):
        return lambda zz: jnp.sum((impl_g.apply(params, zz) - 0.1) ** 2)

    ga, gb = jax.grad(loss(g_ct))(z), jax.grad(loss(g_ph))(z)
    np.testing.assert_allclose(ga, gb, atol=5e-5, rtol=1e-4)


def test_phase_deconv_param_grads_match():
    """G-update leg: param gradients agree between the two impls."""
    g_ct = make_generator("cifar10", ngf=8, nc=3)
    g_ph = make_generator("cifar10", ngf=8, nc=3, impl="phase")
    z = jax.random.normal(jax.random.PRNGKey(5), (4, 16))
    params = g_ct.init(KEY, z)

    def loss(g):
        return lambda p: jnp.sum(g.apply(p, z) ** 2)

    ga = jax.grad(loss(g_ct))(params)
    gb = jax.grad(loss(g_ph))(params)
    chex.assert_trees_all_close(ga, gb, atol=1e-4, rtol=1e-4)


ENC_CASES = [
    ("cifar10", (32, 32, 3)),
    ("svhn", (32, 32, 3)),
    ("celeba64", (64, 64, 3)),
    ("mnist", (28, 28, 1)),
]


@pytest.mark.parametrize("dataset,inp", ENC_CASES)
def test_encoder_output_shapes(dataset, inp):
    enc = make_encoder(dataset, nemb=128, nif=16)
    x = jnp.zeros((2, *inp))
    params = enc.init(KEY, x)
    emb = enc.apply(params, x)
    assert emb.shape == (2, 128)


@pytest.mark.slow
def test_encoder_celebahq_shape():
    enc = make_encoder("celebaHQ", nemb=64, nif=8)
    x = jnp.zeros((1, 256, 256, 3))
    params = enc.init(KEY, x)
    assert enc.apply(params, x).shape == (1, 64)


def test_ebm_scalar_energy():
    ebm = LatentEBM(ndf=200)
    z = jax.random.normal(KEY, (5, 128))
    params = ebm.init(KEY, z)
    en = ebm.apply(params, z)
    assert en.shape == (5,)
    # MLP nz->200->200->1 parameter count parity with _netE
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert n_params == (128 * 200 + 200) + (200 * 200 + 200) + (200 * 1 + 1)


def test_denoiser_shapes_and_residual():
    nz, nxemb, ntemb = 16, 32, 24
    z = jax.random.normal(KEY, (4, nz))
    logsnr = jnp.zeros((4,))
    xemb = jnp.zeros((4, nxemb))

    base = LatentDenoiser(nz=nz, nxemb=nxemb, ntemb=ntemb, residual=False)
    params = base.init(KEY, z, logsnr, xemb)
    eps = base.apply(params, z, logsnr, xemb)
    assert eps.shape == (4, nz)

    res = LatentDenoiser(nz=nz, nxemb=nxemb, ntemb=ntemb, residual=True)
    eps_res = res.apply(params, z, logsnr, xemb)
    np.testing.assert_allclose(
        np.asarray(eps_res), np.asarray(eps + z), rtol=1e-5, atol=1e-6
    )


def test_toy_generator_init_distribution():
    g = ToyGenerator()
    z = jnp.zeros((1, 2))
    params = g.init(KEY, z)
    kernels = [
        v["kernel"] for k, v in params["params"].items() if k.startswith("Dense")
    ]
    # Weights ~ N(0, 0.2^2): std of the big 128x128 kernels should be close.
    big = np.asarray(kernels[1])
    assert abs(big.std() - 0.2) < 0.02
    out = g.apply(params, jax.random.normal(KEY, (7, 2)))
    assert out.shape == (7, 2)


def test_torch_init_bounds():
    """Dense kernel/bias must follow U(+-1/sqrt(fan_in)) like torch."""
    ebm = LatentEBM(ndf=256)
    params = ebm.init(KEY, jnp.zeros((1, 64)))["params"]
    k0 = np.asarray(params["Dense_0"]["kernel"])  # fan_in 64
    bound = 1.0 / np.sqrt(64)
    assert k0.min() >= -bound and k0.max() <= bound
    # Uniform distribution: std ~ bound/sqrt(3)
    assert abs(k0.std() - bound / np.sqrt(3)) < 0.15 * bound


def test_amortizer_init_and_loss():
    q = DAMCAmortizer(nz=8, nxemb=16, ntemb=8, nf=2, nif=4, dataset="mnist", n_interval=5)
    x = jnp.zeros((2, 28, 28, 1))
    params = q.init(KEY, x)
    z = jax.random.normal(KEY, (2, 8))
    mask = jnp.ones((2, 1))
    loss = q.apply(params, jax.random.PRNGKey(3), z, x, mask, method="loss")
    assert loss.shape == (2,)
    assert np.all(np.isfinite(np.asarray(loss)))

    # Unconditional branch (x=None) must also work.
    loss_p = q.apply(params, jax.random.PRNGKey(4), z, method="loss")
    assert loss_p.shape == (2,)


def test_hoisted_sampling_matches_standard():
    """The ctx-hoisted sweep (per-step-constant matmuls precomputed) must
    equal the straightforward path — same keys, same math, reassociated."""
    from damc_tpu.models.amortizer import sample_q

    q = DAMCAmortizer(nz=8, nxemb=16, ntemb=8, nf=2, nif=4, dataset="mnist", n_interval=6)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 28, 28, 1))
    params = q.init(KEY, x)
    for kwargs in ({"x": x}, {"b": 3}):
        z_fast = sample_q(params, q, jax.random.PRNGKey(2), hoisted=True, **kwargs)
        z_slow = sample_q(params, q, jax.random.PRNGKey(2), hoisted=False, **kwargs)
        np.testing.assert_allclose(
            np.asarray(z_fast), np.asarray(z_slow), atol=1e-4
        )


def test_mlp_encoder_shape():
    enc = MLPEncoder(nemb=128)
    x = jnp.zeros((3, 2))
    params = enc.init(KEY, x)
    assert enc.apply(params, x).shape == (3, 128)
