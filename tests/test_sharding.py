"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that the full train step and the Langevin/reverse-diffusion kernels
compile and execute with the batch (chain) axis sharded over `data` and
params replicated — the DP design of SURVEY.md §2.6.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from damc_tpu.ops import langevin_sample, prior_energy
from damc_tpu.parallel import batch_sharding, make_mesh, replicate, replicated, shard_batch
from damc_tpu.train import create_state, make_train_step
from damc_tpu.utils import preset


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_langevin_sharded_chains():
    mesh = make_mesh()
    energy = lambda z: 0.5 * jnp.sum(z * z, axis=-1)
    z0 = shard_batch(mesh, np.ones((16, 4), np.float32))
    run = jax.jit(
        lambda key, z: langevin_sample(key, z, energy, 8, 0.2, with_noise=True)[0],
        out_shardings=batch_sharding(mesh),
    )
    z_final = run(jax.random.PRNGKey(0), z0)
    assert z_final.shape == (16, 4)
    assert z_final.sharding.is_equivalent_to(batch_sharding(mesh), 2)
    assert np.all(np.isfinite(np.asarray(z_final)))


@pytest.mark.slow  # same program shape as the driver's dryrun_multichip +
# the (fast) toy DP-parity test below; kept for full conv-workload coverage
def test_train_step_data_parallel():
    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(cfg.train, batch_size=8, q_updates=1),
    )
    mesh = make_mesh()
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, state)
    x = shard_batch(
        mesh,
        np.random.RandomState(0).uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32),
    )
    step = jax.jit(
        make_train_step(models, opts, cfg),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    new_state, metrics = step(state, x)
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # Params must remain replicated across all 8 devices.
    leaf = jax.tree.leaves(new_state.params_q)[0]
    assert leaf.sharding.is_equivalent_to(replicated(mesh), leaf.ndim)


def test_data_parallel_matches_single_device():
    """DP train step must produce identical params to the unsharded run."""
    cfg = preset("toy")
    cfg = dataclasses.replace(
        cfg,
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2),
        train=dataclasses.replace(cfg.train, batch_size=8, q_updates=1),
    )
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(0).randn(8, 2).astype(np.float32)

    step_single = jax.jit(make_train_step(models, opts, cfg))
    s_single, m_single = step_single(state, jnp.asarray(x))

    mesh = make_mesh()
    step_dp = jax.jit(
        make_train_step(models, opts, cfg),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    s_dp, m_dp = step_dp(replicate(mesh, state), shard_batch(mesh, x))

    np.testing.assert_allclose(
        float(m_single["q_loss"]), float(m_dp["q_loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_single.params_q), jax.tree.leaves(s_dp.params_q), strict=True):
        # fp32 reduction-order differences across devices: allow tiny slack
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)


def test_evaluate_fid_sharded_matches_single_device():
    """The meshed FID path (sharded generation -> device-side stats with XLA
    cross-device reductions) must reproduce the host-side FID for the same
    key and state."""
    from damc_tpu.metrics.fid import make_random_feature_fn
    from damc_tpu.train.gen_recon import evaluate_fid

    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, e_l_steps=2),
    )
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    feat = make_random_feature_fn(jax.random.PRNGKey(1), (32, 32, 3), dim=16)
    rng = np.random.RandomState(0)
    real = rng.rand(64, 32, 32, 3).astype(np.float32)
    from damc_tpu.metrics.fid import compute_stats

    real_mu, real_sigma = compute_stats(feat, [real])

    key = jax.random.PRNGKey(2)
    fid_host = evaluate_fid(
        key, state, models, cfg, feat, real_mu, real_sigma,
        n_samples=64, batch=16, prior="damc", mesh=None,
    )
    mesh = make_mesh()
    state_r = replicate(mesh, state)
    fid_mesh = evaluate_fid(
        key, state_r, models, cfg, feat, real_mu, real_sigma,
        n_samples=64, batch=16, prior="damc", mesh=mesh,
    )
    np.testing.assert_allclose(fid_mesh, fid_host, rtol=1e-3, atol=1e-5)


def test_stylegan_tp_channel_sharding_matches_replicated():
    """Tensor parallelism over the `model` axis for the StyleGAN synthesis
    stack (the one large conv component, SURVEY §2.6): GSPMD channel-shards
    every wide conv/dense kernel and must reproduce the replicated output
    exactly (up to fp reduction order)."""
    from damc_tpu.models.stylegan import (
        generator_apply,
        num_synthesis_layers,
    )
    from damc_tpu.parallel import channel_sharding_tree, shard_params_channelwise

    import os
    if not os.path.isdir("/root/reference/workspace/src"):
        pytest.skip("reference oracle not available")
    import sys
    if "/root/reference/workspace/src" not in sys.path:
        sys.path.insert(0, "/root/reference/workspace/src")
    import torch
    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    from damc_tpu.models.stylegan import convert_generator_state_dict

    torch.manual_seed(0)
    net = StyleGANGeneratorNet(resolution=32, repeat_w=False, final_tanh=True)
    params = convert_generator_state_dict(net.state_dict(), resolution=32)

    n_layers = num_synthesis_layers(32)
    wp = np.random.RandomState(0).randn(4, n_layers * 512).astype(np.float32)

    ref = np.asarray(generator_apply(params, jnp.asarray(wp), resolution=32))

    mesh = make_mesh(n_data=2, n_model=4)  # DP x TP over the 8 CPU devices
    params_tp = shard_params_channelwise(mesh, params, min_channels=64)

    # EVERY wide kernel must actually be sharded (1/4 per device) and every
    # noise buffer replicated - checked leaf-by-leaf with the real policy.
    from damc_tpu.parallel.tp import _on_noise_path

    flat = jax.tree_util.tree_flatten_with_path(params_tp)[0]
    n_sharded = 0
    for path, x in flat:
        wide = x.ndim >= 2 and x.shape[-1] >= 64 and x.shape[-1] % 4 == 0
        shard_last = x.addressable_shards[0].data.shape[-1]
        if wide and not _on_noise_path(path):
            assert shard_last == x.shape[-1] // 4, (path, x.shape)
            n_sharded += 1
        else:
            assert shard_last == x.shape[-1], (path, x.shape)
    assert n_sharded > 0, "no TP-sharded leaves found"

    run = jax.jit(
        lambda p, w: generator_apply(p, w, resolution=32),
        in_shardings=(channel_sharding_tree(mesh, params, 64), batch_sharding(mesh)),
        out_shardings=replicated(mesh),
    )
    out = np.asarray(run(params_tp, shard_batch(mesh, wp)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_evaluate_inversion_mesh_matches_single_device():
    """The full StyleGAN-inversion eval sweep (Q sweep -> rescue -> Adam
    refine -> recon MSE) must produce the same metrics with its batches
    DP-sharded over the 8-device mesh as on one device: same program
    semantics, params replicated, batch over `data`."""
    import os
    import sys

    if not os.path.isdir("/root/reference/workspace/src"):
        pytest.skip("reference oracle not available")
    if "/root/reference/workspace/src" not in sys.path:
        sys.path.insert(0, "/root/reference/workspace/src")
    import torch
    from stylegan.perceptual_model import VGG16
    from stylegan.stylegan_encoder_network import StyleGANEncoderNet
    from stylegan.stylegan_generator_network import StyleGANGeneratorNet

    from damc_tpu.models.stylegan import (
        convert_encoder_state_dict,
        convert_generator_state_dict,
        convert_vgg16_state_dict,
    )
    from damc_tpu.train.stylegan_inv import (
        evaluate_inversion,
        make_stylegan_amortizer,
    )

    torch.manual_seed(0)
    sp = {
        "generator": convert_generator_state_dict(
            StyleGANGeneratorNet(
                resolution=32, repeat_w=False, final_tanh=True
            ).state_dict(),
            32,
        ),
        "encoder": convert_encoder_state_dict(
            StyleGANEncoderNet(
                resolution=32, use_wscale=False, use_bn=True
            ).state_dict(),
            32,
        ),
        "vgg": convert_vgg16_state_dict(VGG16().state_dict()),
    }

    cfg = preset("cifar10")
    cfg = dataclasses.replace(
        cfg, diffusion=dataclasses.replace(cfg.diffusion, n_interval=2)
    )
    q_model = make_stylegan_amortizer(cfg, resolution=32)
    q_params = q_model.init(jax.random.PRNGKey(0), jnp.zeros((1, q_model.nz)))
    # 10 images with batch 8: exercises the padded tail under sharding too
    images = np.random.RandomState(3).uniform(-1, 1, (10, 32, 32, 3)).astype(
        np.float32
    )

    # minimal sizes: the 8-virtual-device GSPMD compile of this program is
    # minutes on the 1-core CPU (measured ~6 min); numerics, not perf, are
    # under test here
    kw = dict(batch=8, steps=2, lr=0.05, resolution=32)
    ref = evaluate_inversion(
        jax.random.PRNGKey(1), q_params, q_model, sp, images, **kw
    )
    out = evaluate_inversion(
        jax.random.PRNGKey(1), q_params, q_model, sp, images,
        mesh=make_mesh(), **kw
    )
    assert np.isfinite(out["recon_mse"])
    # sharded conv/reduce orders differ; measured rel diff ~4e-6
    np.testing.assert_allclose(out["recon_mse"], ref["recon_mse"], rtol=1e-4)

    with pytest.raises(ValueError, match="divide"):
        evaluate_inversion(
            jax.random.PRNGKey(1), q_params, q_model, sp, images,
            mesh=make_mesh(), batch=6, steps=2, lr=0.05, resolution=32,
        )


def test_evaluate_mse_mesh_matches_single_device():
    """evaluate_mse with a mesh (state replicated, batches sharded) equals
    the single-device protocol bit-for-bit up to reduce-order numerics —
    same batch grouping, same fold_in keys."""
    from tests.train_step_fixture import tiny_cfg

    from damc_tpu.parallel import replicate
    from damc_tpu.train.gen_recon import evaluate_mse
    from damc_tpu.train.state import create_state

    cfg = tiny_cfg(batch_size=8)
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    images = np.random.RandomState(5).uniform(
        -1, 1, (20, cfg.model.image_size, cfg.model.image_size, 3)
    ).astype(np.float32)

    ref = evaluate_mse(jax.random.PRNGKey(2), state, models, cfg, images, 8)
    mesh = make_mesh()
    out = evaluate_mse(
        jax.random.PRNGKey(2), replicate(mesh, state), models, cfg, images, 8,
        mesh=mesh,
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4)

    # non-divisible batch rounds up to a shardable size and still runs
    out7 = evaluate_mse(
        jax.random.PRNGKey(2), replicate(mesh, state), models, cfg, images, 7,
        mesh=mesh,
    )
    assert np.isfinite(out7)


def test_evaluate_auprc_mesh_matches_single_device():
    """evaluate_auprc with a mesh equals the single-device sweep (scores are
    per-image; same keys, same grouping)."""
    from tests.train_step_fixture import tiny_cfg

    from damc_tpu.parallel import replicate
    from damc_tpu.train.anomaly import evaluate_auprc
    from damc_tpu.train.state import create_state

    cfg = tiny_cfg(batch_size=8)
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(6)
    images = rng.uniform(
        -1, 1, (20, cfg.model.image_size, cfg.model.image_size, 3)
    ).astype(np.float32)
    labels = (rng.rand(20) > 0.5).astype(np.int32)

    ref = evaluate_auprc(
        jax.random.PRNGKey(3), state, models, cfg, images, labels,
        batch=8, langevin_steps=2,
    )
    mesh = make_mesh()
    out = evaluate_auprc(
        jax.random.PRNGKey(3), replicate(mesh, state), models, cfg, images,
        labels, batch=8, langevin_steps=2, mesh=mesh,
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_make_mesh_rejects_non_dividing_model_axis():
    """Silently building a smaller mesh would leave chips idle with every
    throughput number quietly wrong for the assumed topology."""
    import pytest

    from damc_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(n_model=3)  # 8 virtual devices
    # Explicit n_data opts into a subset intentionally.
    mesh = make_mesh(n_data=2, n_model=3)
    assert mesh.shape == {"data": 2, "model": 3}
