"""Device-resident data path (`data/device_data.py`) and its driver wiring.

The device path replaces the host loader + per-batch device_put for
array-backed stores; these tests pin the Loader-invariant semantics
(per-epoch permutation coverage, drop_last, [-1,1] normalization,
Bernoulli flips), the mesh sharding of the produced batches, and the
`make_batch_source` placement dispatch used by both training drivers.
"""

import jax
import numpy as np
import pytest

from damc_tpu.data.device_data import (
    DEFAULT_DEVICE_BUDGET_BYTES,
    DeviceDataset,
    fits_device,
)
from damc_tpu.parallel import make_mesh
from damc_tpu.train.driver_utils import make_batch_source
from damc_tpu.utils.config import Config


def _store_u8(n=40, h=8, w=8, c=3, seed=0):
    return np.random.RandomState(seed).randint(0, 256, size=(n, h, w, c)).astype(np.uint8)


def test_fits_device_gate():
    assert fits_device(_store_u8())
    assert fits_device(_store_u8().astype(np.float32))
    assert not fits_device(_store_u8().astype(np.float64))  # dtype
    assert not fits_device(_store_u8()[0])  # ndim
    assert not fits_device(list(_store_u8()))  # lazy/non-ndarray
    assert not fits_device(_store_u8(), budget_bytes=10)  # budget


def test_epoch_coverage_and_drop_last():
    imgs = _store_u8(n=41)  # 41 % 16 = 9-image tail dropped per epoch
    ds = DeviceDataset(imgs, batch_size=16, seed=3)
    stream = ds.stream()
    for _ in range(3):  # each epoch: 2 batches of distinct indices
        idx = np.concatenate([np.asarray(next(stream)[1]) for _ in range(len(ds))])
        assert len(idx) == 32
        assert len(np.unique(idx)) == 32  # no repeats within an epoch
        assert idx.min() >= 0 and idx.max() < 41


def test_batch_values_match_store():
    imgs = _store_u8(n=24)
    ds = DeviceDataset(imgs, batch_size=8, seed=1, augment_flip=False)
    batch, idx = next(ds.stream())
    want = imgs[np.asarray(idx)].astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(np.asarray(batch), want, rtol=0, atol=1e-6)
    assert np.asarray(batch).min() >= -1.0 and np.asarray(batch).max() <= 1.0


def test_float32_store_passes_through_unnormalized():
    imgs = (np.random.RandomState(0).rand(16, 4, 4, 1).astype(np.float32) - 0.5) * 2
    ds = DeviceDataset(imgs, batch_size=8, seed=0)
    batch, idx = next(ds.stream())
    np.testing.assert_allclose(np.asarray(batch), imgs[np.asarray(idx)], atol=1e-6)


def test_flip_is_bernoulli_mirror():
    imgs = _store_u8(n=32)
    ds = DeviceDataset(imgs, batch_size=32, seed=5, augment_flip=True)
    batch, idx = next(ds.stream())
    batch, idx = np.asarray(batch), np.asarray(idx)
    base = imgs[idx].astype(np.float32) / 255.0 * 2.0 - 1.0
    flipped = 0
    for r in range(32):
        if np.allclose(batch[r], base[r], atol=1e-6):
            continue
        np.testing.assert_allclose(batch[r], base[r][:, ::-1, :], atol=1e-6)
        flipped += 1
    assert 0 < flipped < 32  # Bernoulli(0.5): both outcomes present


def test_shuffle_false_is_sequential():
    imgs = _store_u8(n=20)
    ds = DeviceDataset(imgs, batch_size=10, shuffle=False)
    s = ds.stream()
    np.testing.assert_array_equal(np.asarray(next(s)[1]), np.arange(10))
    np.testing.assert_array_equal(np.asarray(next(s)[1]), np.arange(10, 20))


def test_epochs_use_distinct_permutations():
    imgs = _store_u8(n=64)
    ds = DeviceDataset(imgs, batch_size=64, seed=7)
    s = ds.stream()
    e0, e1 = np.asarray(next(s)[1]), np.asarray(next(s)[1])
    assert not np.array_equal(e0, e1)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        DeviceDataset(_store_u8(), batch_size=16, drop_last=False)
    with pytest.raises(ValueError):
        DeviceDataset(_store_u8().astype(np.int32), batch_size=16)
    with pytest.raises(ValueError):
        DeviceDataset(_store_u8(n=4), batch_size=16)  # no full batch


def test_mesh_batches_shard_over_data_axis():
    mesh = make_mesh()
    imgs = _store_u8(n=32)
    ds = DeviceDataset(imgs, batch_size=16, seed=2, mesh=mesh)
    batch, idx = next(ds.stream())
    shards = batch.sharding.addressable_devices
    assert len(shards) == mesh.shape["data"]
    want = imgs[np.asarray(idx)].astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(np.asarray(batch), want, atol=1e-6)


class _TC:
    def __init__(self, placement, batch_size=16):
        self.data_placement = placement
        self.batch_size = batch_size


def test_make_batch_source_placement_dispatch():
    imgs = _store_u8(n=32)
    nb, close, placement = make_batch_source(imgs, _TC("auto"), None, seed=0)
    assert placement == "device"
    x = nb()
    assert isinstance(x, jax.Array) and x.shape == (16, 8, 8, 3)
    close()

    nb, close, placement = make_batch_source(imgs, _TC("host"), None, seed=0)
    assert placement == "host"
    x = nb()
    assert isinstance(x, jax.Array) and x.shape == (16, 8, 8, 3)
    close()

    # lazy/non-array stores fall back under 'auto'
    class Lazy:
        def __len__(self):
            return 32

        def __getitem__(self, idx):
            return np.zeros((len(idx), 8, 8, 3), np.float32), np.asarray(idx)

    with pytest.raises(ValueError):
        make_batch_source(imgs, _TC("nope"), None, seed=0)
    with pytest.raises(ValueError):
        # explicit 'device' on an ineligible store must be loud
        make_batch_source(np.zeros((4, 2), np.float32), _TC("device"), None, seed=0)


def test_device_budget_knob():
    """TrainConfig.data_device_budget_gb overrides the 8 GB default; a
    budget below the store size demotes 'auto' to host and makes an
    explicit 'device' loud."""
    imgs = _store_u8(n=32)  # 6 KB store

    tc = _TC("auto")
    tc.data_device_budget_gb = imgs.nbytes / (1 << 30) / 2  # half the store
    nb, close, placement = make_batch_source(imgs, tc, None, seed=0)
    assert placement == "host"
    close()

    tc = _TC("device")
    tc.data_device_budget_gb = imgs.nbytes / (1 << 30) / 2
    with pytest.raises(ValueError):
        make_batch_source(imgs, tc, None, seed=0)

    # CelebA-HQ-256 scale (30k x 256x256x3 uint8 = 5.9 GB) must qualify
    # under the default budget (where the device feed measured 7.8x).
    assert DEFAULT_DEVICE_BUDGET_BYTES >= 30_000 * 256 * 256 * 3


def test_driver_runs_on_device_placement(tmp_path):
    """Tiny gen_recon run end-to-end with the device-resident feed."""
    import dataclasses

    from damc_tpu.train.gen_recon import train_gen_recon
    from damc_tpu.utils import preset

    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train, data_placement="device", batch_size=16, q_updates=1,
            print_every=1, eval_every=0, plot_every=0, ckpt_every=0,
        ),
    )
    imgs = _store_u8(n=cfg.train.batch_size * 2, h=cfg.model.image_size,
                     w=cfg.model.image_size, c=cfg.model.nc)
    state = train_gen_recon(
        cfg, imgs, iterations=3, log_dir=str(tmp_path), seed=0
    )
    assert int(state.step) == 3
