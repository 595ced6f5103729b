"""InceptionV3-for-FID tests: shapes, pooling semantics vs torch, BN folding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from damc_tpu.models.inception import (
    ARCH_SPEC,
    _avg_pool_excl_pad,
    _basic_conv,
    _max_pool,
    convert_torch_state_dict,
    inception_pool3,
    init_random_params,
)


@pytest.fixture(scope="module")
def params():
    return init_random_params(jax.random.PRNGKey(0))


def test_pool3_shape_rgb_and_gray(params):
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    assert inception_pool3(params, x).shape == (2, 2048)
    g = jax.random.uniform(jax.random.PRNGKey(2), (2, 28, 28, 1))
    assert inception_pool3(params, g).shape == (2, 2048)


def test_avg_pool_excl_pad_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).randn(2, 7, 9, 5).astype(np.float32)
    mine = np.asarray(_avg_pool_excl_pad(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.avg_pool2d(xt, 3, stride=1, padding=1, count_include_pad=False)
    np.testing.assert_allclose(mine, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_max_pool_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(1).randn(2, 11, 11, 3).astype(np.float32)
    mine = np.asarray(_max_pool(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.max_pool2d(xt, 3, stride=2)
    np.testing.assert_allclose(mine, ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_bn_folding_matches_torch_conv_bn_relu():
    import torch

    rng = np.random.RandomState(2)
    w = rng.randn(8, 4, 3, 3).astype(np.float32) * 0.1  # OIHW
    gamma = rng.rand(8).astype(np.float32) + 0.5
    beta = rng.randn(8).astype(np.float32) * 0.1
    mean = rng.randn(8).astype(np.float32) * 0.1
    var = rng.rand(8).astype(np.float32) + 0.5

    sd = {
        "Conv2d_1a_3x3.conv.weight": w,
        "Conv2d_1a_3x3.bn.weight": gamma,
        "Conv2d_1a_3x3.bn.bias": beta,
        "Conv2d_1a_3x3.bn.running_mean": mean,
        "Conv2d_1a_3x3.bn.running_var": var,
    }
    params = convert_torch_state_dict(sd)

    x = rng.randn(2, 10, 10, 4).astype(np.float32)
    mine = np.asarray(
        _basic_conv(jnp.asarray(x), params["Conv2d_1a_3x3"], (2, 2), "VALID")
    )

    conv = torch.nn.Conv2d(4, 8, 3, stride=2, bias=False)
    conv.weight.data = torch.from_numpy(w)
    bn = torch.nn.BatchNorm2d(8, eps=0.001)
    bn.weight.data = torch.from_numpy(gamma)
    bn.bias.data = torch.from_numpy(beta)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    bn.eval()
    with torch.no_grad():
        ref = torch.relu(bn(conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))))
    np.testing.assert_allclose(
        mine, ref.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


def test_conversion_covers_full_architecture(params):
    """Round-trip: fabricate a torch-style state_dict for every conv in the
    ARCH_SPEC, convert, and run the full forward."""
    rng = np.random.RandomState(3)
    sd = {}
    for name, spec in ARCH_SPEC.items():
        entries = {name: spec} if isinstance(spec, tuple) else {
            f"{name}.{sub}": s for sub, s in spec.items()
        }
        for full, (cin, cout, kh, kw) in entries.items():
            sd[f"{full}.conv.weight"] = rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
            sd[f"{full}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{full}.bn.bias"] = np.zeros(cout, np.float32)
            sd[f"{full}.bn.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{full}.bn.running_var"] = np.ones(cout, np.float32)
    converted = convert_torch_state_dict(sd)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3))
    assert inception_pool3(converted, x).shape == (1, 2048)
