"""Checkpoint/resume tests: full-state round trip incl. EMA + optimizer + PRNG
(the reference loses E/E_opt/Q_dummy on resume — we assert we do not)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from damc_tpu.train import create_state, make_train_step
from damc_tpu.utils import preset, restore_checkpoint, save_checkpoint


def tiny_cfg():
    cfg = preset("svhn")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(cfg.train, batch_size=4, q_updates=1),
    )


def test_full_state_roundtrip_and_exact_resume(tmp_path):
    """One train-step compile serves both assertions: (a) EVERY leaf of the
    state round-trips through Orbax (params G/E/Q, EMA, optimizer states,
    rng — the reference loses E/E_opt/Q_dummy); (b) step(restore(save(s)))
    equals step(s) exactly."""
    cfg = tiny_cfg()
    state, models, opts = create_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(models, opts, cfg))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3), minval=-1, maxval=1)
    state, _ = step(state, x)
    state, _ = step(state, x)

    save_checkpoint(str(tmp_path), "2", state)

    template, _, _ = create_state(jax.random.PRNGKey(99), cfg)
    restored = restore_checkpoint(str(tmp_path), "2", template)

    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Exact-resume continuity: same compiled step, identical next metrics.
    s_direct, m_direct = step(state, x)
    s_resumed, m_resumed = step(restored, x)
    np.testing.assert_array_equal(
        np.asarray(m_direct["q_loss"]), np.asarray(m_resumed["q_loss"])
    )
    for a, b in zip(jax.tree.leaves(s_direct.params_e), jax.tree.leaves(s_resumed.params_e), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step(tmp_path):
    from damc_tpu.utils import latest_step

    assert latest_step(str(tmp_path)) is None
    (tmp_path / "100").mkdir()
    (tmp_path / "2500").mkdir()
    (tmp_path / "best").mkdir()
    assert latest_step(str(tmp_path)) == 2500
