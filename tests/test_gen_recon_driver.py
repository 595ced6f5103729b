"""gen_recon driver integration test: full loop incl. FID/MSE evals + artifacts."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from damc_tpu.metrics.fid import make_random_feature_fn
from damc_tpu.train.gen_recon import train_gen_recon
from damc_tpu.utils import preset


@pytest.mark.slow
def test_gen_recon_driver_end_to_end(tmp_path):
    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=3),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train,
            batch_size=16,
            q_updates=1,
            n_fid_samples=32,
            eval_every=4,
            print_every=2,
            plot_every=4,
            ckpt_every=4,
        ),
    )
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (64, 32, 32, 3), np.uint8)  # uint8 -> native loader
    feat = make_random_feature_fn(jax.random.PRNGKey(0), (32, 32, 3), dim=24)

    state = train_gen_recon(
        cfg,
        imgs,
        fid_images=imgs[:48],
        mse_images=imgs[:32].astype(np.float32) / 255.0 * 2 - 1,
        feature_fn=feat,
        iterations=5,
        log_dir=str(tmp_path),
    )
    assert int(state.step) == 5
    assert (tmp_path / "metrics.jsonl").exists()
    # eval metrics present in the stream
    import json

    records = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    evals = [r for r in records if r["phase"] == "eval"]
    assert evals and {"fid_damc", "fid_ebm", "recon_mse", "fid_best"} <= set(evals[0])
    assert all(np.isfinite(v) for r in evals for k, v in r.items() if k.startswith("fid"))
    # artifacts: all four grids + ckpt + best
    for suffix in ("obs", "post", "post_Q", "prior"):
        assert (tmp_path / "imgs" / f"4_{suffix}.png").exists()
    assert (tmp_path / "ckpt" / "4").exists()
    assert (tmp_path / "ckpt" / "best").exists()


@pytest.mark.slow
def test_gen_recon_resume(tmp_path):
    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=16),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train,
            batch_size=8,
            q_updates=1,
            eval_every=10_000,
            print_every=10_000,
            plot_every=10_000,
            ckpt_every=2,
        ),
    )
    imgs = np.random.RandomState(0).randint(0, 256, (32, 32, 32, 3), np.uint8)
    train_gen_recon(cfg, imgs, iterations=3, log_dir=str(tmp_path))
    assert (tmp_path / "ckpt" / "2").exists()

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume_path=str(tmp_path / "ckpt" / "2"))
    )
    state = train_gen_recon(cfg2, imgs, iterations=4, log_dir=str(tmp_path))
    assert int(state.step) == 4  # resumed at 2, ran 2 more


def test_terminal_checkpoint_and_eval(tmp_path):
    """Training past the last periodic checkpoint/eval must not be silently
    discarded: when the intervals don't land on the final iteration, the
    driver saves a terminal checkpoint (resumable via `auto`) and runs a
    terminal eval — the reference's inclusive loop fires its intervals at
    the terminal iteration (`train_gen_recon.py:179`); our exclusive loop
    covers the tail explicitly."""
    import json

    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=8),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train, batch_size=8, q_updates=1, eval_every=3,
            print_every=10_000, plot_every=0, ckpt_every=4,
        ),
    )
    imgs = np.random.RandomState(1).randint(0, 256, (24, 32, 32, 3), np.uint8)
    mse = imgs[:8].astype(np.float32) / 255.0 * 2 - 1
    state = train_gen_recon(
        cfg, imgs, mse_images=mse, iterations=6, log_dir=str(tmp_path)
    )
    assert int(state.step) == 6
    # Periodic ckpt at it=4 AND the terminal one at it=5 (5 % 4 != 0).
    assert (tmp_path / "ckpt" / "4").exists()
    assert (tmp_path / "ckpt" / "5").exists()
    # Evals at 0 and 3 (interval) and 5 (terminal; 5 % 3 != 0).
    records = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    eval_steps = [r["step"] for r in records if r["phase"] == "eval"]
    assert eval_steps == [0, 3, 5]
    assert all(
        "recon_mse" in r and "recon_mse_best" in r
        for r in records if r["phase"] == "eval"
    )
    # Terminal checkpoint resumes to a no-op (nothing left to train).
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume_path="auto")
    )
    state2 = train_gen_recon(
        cfg2, imgs, mse_images=mse, iterations=6, log_dir=str(tmp_path)
    )
    assert int(state2.step) == 6


def test_evaluate_mse_protocol_non_divisible():
    """drop_last=False parity: evaluate_mse must cover EVERY eval image and
    divide by the true count (`train_gen_recon.py:111,345` — mloader pads
    nothing but iterates the whole mset; `mse_lss /= len(mset)`). A
    non-divisible set must therefore equal the batch-free per-image mean,
    not the mean over the divisible prefix."""
    import dataclasses

    from damc_tpu.train.gen_recon import evaluate_mse, make_recon_fn
    from damc_tpu.train.sampling import recon_mse_per_image, reconstruct
    from damc_tpu.train.state import create_state

    cfg = preset("svhn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=8),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2),
    )
    state, models, _ = create_state(jax.random.PRNGKey(0), cfg)
    n, batch = 21, 8  # 2 full batches + tail of 5
    x = np.random.RandomState(3).uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)

    key = jax.random.PRNGKey(9)
    got = evaluate_mse(key, state, models, cfg, x, batch)

    # Oracle: per-image MSE computed batch-by-batch with the same keys the
    # eval loop folds in, summed over ALL n images, divided by n.
    total = 0.0
    for i in range(0, n, batch):
        xb = x[i : i + batch]
        real = len(xb)
        if real < batch:  # same padded shape => same compiled program & key
            xb = np.concatenate([xb, np.repeat(xb[-1:], batch - real, axis=0)])
        x_hat, _ = reconstruct(
            jax.random.fold_in(key, i), state, models, cfg,
            jax.numpy.asarray(xb), langevin_steps=10,
        )
        total += float(jax.numpy.sum(recon_mse_per_image(x_hat, jax.numpy.asarray(xb))[:real]))
    expect = total / n
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    # Tiny-set path must reuse the caller's recon_fn (its langevin_steps),
    # not silently rebuild with defaults.
    probe = {"called": 0}
    rf = make_recon_fn(models, cfg, langevin_steps=1)

    def counting_rf(st, k, xb):
        probe["called"] += 1
        return rf(st, k, xb)

    evaluate_mse(key, state, models, cfg, x[:3], batch, recon_fn=counting_rf)
    assert probe["called"] == 1


def test_multihost_without_mesh_is_rejected(monkeypatch):
    """A multi-process run with use_mesh=False would silently train N
    independent models on disjoint shards while sharing a checkpoint path
    (host_shard/local_batch_size split the data but put_batch does a plain
    local device_put) — both drivers must refuse up front."""
    import numpy as np
    import pytest

    import damc_tpu.train.anomaly as anomaly_mod
    import damc_tpu.train.gen_recon as gen_recon_mod
    from damc_tpu.train.anomaly import train_anomaly
    from damc_tpu.train.gen_recon import train_gen_recon
    from damc_tpu.utils.config import preset

    monkeypatch.setattr(gen_recon_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(anomaly_mod.jax, "process_count", lambda: 2)
    imgs = np.zeros((16, 32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="use_mesh"):
        train_gen_recon(preset("cifar10"), imgs, use_mesh=False)
    m_imgs = np.zeros((16, 28, 28, 1), dtype=np.uint8)
    with pytest.raises(ValueError, match="use_mesh"):
        train_anomaly(preset("mnist_anomaly"), m_imgs, use_mesh=False)


def test_cd_gap_monitor_fires_on_runaway(capsys):
    """Failure detection for the CD runaway characterized in
    artifacts/CD_DIVERGENCE.md: healthy gaps -> no alarm; a gap 50x the
    warmup median -> alarm metric + one-time warning."""
    from damc_tpu.train.driver_utils import CDGapMonitor

    mon = CDGapMonitor(warmup=5, factor=50.0)
    # Warmup: |gap| ~ 15 (typical healthy value from the endurance runs).
    for it in range(5):
        out = mon.update(it * 10, {"e_pos": -113.0, "e_neg": -98.0 + it})
        assert out == {"cd_gap_alarm": 0.0}
    # Healthy post-warmup observation: no alarm.
    assert mon.update(60, {"e_pos": -150.0, "e_neg": -120.0}) == {"cd_gap_alarm": 0.0}
    assert mon.fired_at is None
    # Runaway (iter-4500 anatomy: gap ~ 2.2e4): alarm fires once.
    out = mon.update(4500, {"e_pos": -6.4e3, "e_neg": 1.6e4})
    assert out == {"cd_gap_alarm": 1.0}
    assert mon.fired_at == 4500
    assert "runaway at iteration 4500" in capsys.readouterr().out
    # Second alarmed update keeps the metric high but does NOT re-print.
    out = mon.update(4600, {"e_pos": -1.1e5, "e_neg": 6.6e5})
    assert out == {"cd_gap_alarm": 1.0}
    assert mon.fired_at == 4500
    assert capsys.readouterr().out == ""
    # Metrics without energies (e.g. anomaly eval rows) are a no-op.
    assert mon.update(4700, {"g_loss": 1.0}) == {}


def test_cd_gap_monitor_ceiling_tolerates_regularizer_plateau(capsys):
    """With train.e_energy_reg = α > 0 the E loss pins mean energies at the
    analytic fixed points ∓1/(2α) (CD_DIVERGENCE.md experiment 3), so the
    gap DESIGNEDLY saturates at 1/α — far above 50x the healthy warmup
    median. The drivers therefore pass gap_ceiling = 1.25/α: the plateau
    must NOT alarm, while a gap escaping the regularizer's bound must."""
    from damc_tpu.train.driver_utils import CDGapMonitor, cd_gap_ceiling

    alpha = 2e-4  # the reg2e4 endurance-run setting; fixed points ∓2500
    assert cd_gap_ceiling(0.0) is None  # exact reference CD: no ceiling
    assert cd_gap_ceiling(alpha) == 1.25 / alpha  # 6250

    mon = CDGapMonitor(warmup=5, factor=50.0, gap_ceiling=cd_gap_ceiling(alpha))
    for it in range(5):  # healthy warmup, |gap| ~ 15
        mon.update(it * 10, {"e_pos": -113.0, "e_neg": -98.0 + it})
    # Plateau approach and steady state (reg2e4_100k anatomy): gap rises
    # through 50x median (~750) up to ~1/α = 5000. No alarm anywhere.
    for it, (ep, en) in [(5000, (-1406.0, 1317.0)), (12000, (-2592.0, 2476.0)),
                         (24950, (-2493.0, 2504.0))]:
        assert mon.update(it, {"e_pos": ep, "e_neg": en}) == {"cd_gap_alarm": 0.0}
    assert mon.fired_at is None and capsys.readouterr().out == ""
    # A gap beyond the ceiling means the regularizer's guarantee failed:
    # that IS a real alarm again.
    out = mon.update(30000, {"e_pos": -4.0e3, "e_neg": 4.0e3})
    assert out == {"cd_gap_alarm": 1.0} and mon.fired_at == 30000
    assert "ceiling 6.250e+03" in capsys.readouterr().out


def test_cd_gap_monitor_seed_from_history_keeps_alarm_armed(tmp_path, capsys):
    """Resuming after runaway onset must NOT re-learn the warmup baseline
    from runaway-scale gaps (which would disarm the alarm for the rest of
    the run). seed_from_history replays the pre-resume metrics.jsonl."""
    import json

    from damc_tpu.train.driver_utils import CDGapMonitor

    path = tmp_path / "metrics.jsonl"
    rows = [
        {"step": it * 50, "phase": "train", "e_pos": -113.0, "e_neg": -98.0}
        for it in range(6)  # healthy warmup, |gap| = 15
    ]
    rows += [
        {"step": 5000 + i * 50, "phase": "train", "e_pos": -6.4e3, "e_neg": 1.6e4}
        for i in range(3)  # post-onset runaway rows
    ]
    rows.append({"step": 5150, "phase": "eval", "fid_damc": 30.0})  # skipped
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write('{"step": 5200, "phase": "tr')  # torn tail from preemption

    # The buggy behavior this guards against: a FRESH monitor fed only the
    # post-resume (runaway-scale) stream never alarms.
    fresh = CDGapMonitor(warmup=5, factor=50.0)
    for i in range(6):
        out = fresh.update(5200 + i * 50, {"e_pos": -6.4e3, "e_neg": 1.6e4})
    assert out == {"cd_gap_alarm": 0.0} and fresh.fired_at is None

    seeded = CDGapMonitor(warmup=5, factor=50.0)
    seeded.seed_from_history(str(path), upto_iter=5200)
    assert seeded.fired_at == 5000  # replay re-detected the onset, silently
    assert "resumed run had already tripped" in capsys.readouterr().out
    out = seeded.update(5200, {"e_pos": -6.4e3, "e_neg": 1.6e4})
    assert out == {"cd_gap_alarm": 1.0}  # alarm stays armed post-resume
    assert capsys.readouterr().out == ""  # and does not re-print

    # Missing / None path: harmless no-op (fresh runs).
    CDGapMonitor().seed_from_history(None, 100)
    CDGapMonitor().seed_from_history(str(tmp_path / "absent.jsonl"), 100)


def test_cd_history_path_explicit_resume_falls_back_to_old_run(tmp_path):
    """An EXPLICIT --resume_path <run>/ckpt/<step> lands in a freshly
    stamped log dir whose metrics.jsonl is empty; the monitor must replay
    the RESUMED run's jsonl (two levels up from the checkpoint step dir),
    not silently re-learn its baseline from post-resume gaps."""
    from damc_tpu.train.driver_utils import cd_history_path

    old_run = tmp_path / "old_run"
    (old_run / "ckpt" / "5000").mkdir(parents=True)
    old_jsonl = old_run / "metrics.jsonl"
    old_jsonl.write_text('{"step": 0, "phase": "train"}\n')
    new_run = tmp_path / "new_run"
    new_run.mkdir()
    new_jsonl = new_run / "metrics.jsonl"

    resume = str(old_run / "ckpt" / "5000")
    # Fresh (empty/absent) current jsonl -> the resumed run's history.
    assert cd_history_path(str(new_jsonl), resume) == str(old_jsonl)
    new_jsonl.write_text("")
    assert cd_history_path(str(new_jsonl), resume) == str(old_jsonl)
    # Trailing slash on the ckpt path resolves identically.
    assert cd_history_path(str(new_jsonl), resume + "/") == str(old_jsonl)
    # auto-resume reuses the original run dir: current jsonl has content.
    new_jsonl.write_text('{"step": 10, "phase": "train"}\n')
    assert cd_history_path(str(new_jsonl), "auto") == str(new_jsonl)
    # Explicit resume whose run dir has no jsonl: keep the current path.
    bare = tmp_path / "bare" / "ckpt" / "100"
    bare.mkdir(parents=True)
    new_jsonl.write_text("")
    assert cd_history_path(str(new_jsonl), str(bare)) == str(new_jsonl)
    # No log dir at all (logger.path is None).
    assert cd_history_path(None, resume) == str(old_jsonl)


def test_shutdown_agreed_single_process_is_the_flag():
    from damc_tpu.train.driver_utils import shutdown_agreed
    from damc_tpu.utils.preemption import ShutdownFlag

    flag = ShutdownFlag()
    assert shutdown_agreed(flag) is False
    flag.set(15)
    assert shutdown_agreed(flag) is True
