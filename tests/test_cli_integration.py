"""CLI end-to-end integration: train_gen_recon + eval_gen_recon over a
fabricated CIFAR-10 pickle tree (exercises argparse -> config -> data readers
-> driver -> checkpoints -> eval restore)."""

import os
import pickle

import numpy as np

from damc_tpu.utils import profiling  # noqa: F401  (import coverage)


def fake_cifar(root: str, n_train=40, n_test=16, seed=0):
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(seed)

    def write(name, n):
        data = rng.randint(0, 256, (n, 3072), np.uint8)
        with open(os.path.join(base, name), "wb") as f:
            pickle.dump({"data": data, "labels": [0] * n}, f)

    for i in range(1, 6):
        write(f"data_batch_{i}", n_train // 5)
    write("test_batch", n_test)


def test_train_and_eval_cli_roundtrip(tmp_path, monkeypatch):
    """The fast-tier end-to-end gate: train -> metrics/ckpt -> eval restore,
    all through the real CLIs (kept in the default selection so the e2e path
    cannot silently rot; --plot_every 0 skips the three plot-only programs
    to hold CPU compile time down)."""
    from damc_tpu.cli import eval_gen_recon, train_gen_recon

    data_dir = str(tmp_path / "data")
    log_dir = str(tmp_path / "logs")
    fake_cifar(data_dir)

    common = [
        "--dataset", "cifar10",
        "--data_path", data_dir,
        "--log_path", log_dir,
        # tiny model + schedule so CPU CI stays fast
        "--nz", "8", "--ngf", "8", "--nif", "8", "--nxemb", "16", "--ntemb", "16",
        "--n_interval", "2", "--g_l_steps", "2", "--e_l_steps", "2",
        "--batch_size", "8", "--n_fid_samples", "16",
    ]
    train_gen_recon.main(common + ["--iterations", "3", "--plot_every", "0"])

    # one run dir with config provenance + ckpt/best from the eval gate
    runs = os.listdir(os.path.join(log_dir, "cifar10"))
    assert len(runs) == 1
    run_dir = os.path.join(log_dir, "cifar10", runs[0])
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    ckpt_dir = os.path.join(run_dir, "ckpt")
    assert os.path.exists(os.path.join(ckpt_dir, "best"))

    # eval CLI restores the checkpoint and prints FID + MSE without error
    eval_gen_recon.main(common + ["--ckpt_dir", ckpt_dir, "--ckpt_name", "best"])

    # the same eval DP-sharded over the 8 virtual devices (state replicated,
    # batches over `data`); equality vs single-device is pinned in
    # tests/test_sharding.py — here the full CLI wiring must execute
    eval_gen_recon.main(
        common + ["--ckpt_dir", ckpt_dir, "--ckpt_name", "best", "--use_mesh"]
    )

    # --multihost (lifted in round 4, commit 41edc07): with one process it
    # degrades to the plain single-process eval instead of refusing; the
    # REAL 2-process equality gate is
    # test_distributed.py::test_two_process_eval_gen_recon_matches_single_process
    eval_gen_recon.main(
        common + ["--ckpt_dir", ckpt_dir, "--ckpt_name", "best", "--multihost"]
    )


def test_step_timer_reports():
    import time

    from damc_tpu.utils.profiling import StepTimer

    t = StepTimer(ema=0.5)
    for _ in range(3):
        with t.phase("work"):
            time.sleep(0.01)
    rep = t.report()
    assert rep["time_s/work"] >= 0.005
    assert rep["steps_per_s/work"] > 0


def test_global_batch_single_process():
    import jax

    from damc_tpu.parallel import global_mesh, make_global_batch

    mesh = global_mesh()
    host = np.arange(16 * 2, dtype=np.float32).reshape(16, 2)
    arr = make_global_batch(mesh, host)
    assert arr.shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(arr), host)


def test_make_log_dir_auto_resume_reuses_newest_run(tmp_path):
    """Preemption recovery is "re-run the same command": with
    --resume_path auto, make_log_dir must land in the NEWEST existing run
    dir (where `auto` finds its checkpoints and metrics.jsonl seeds the
    CD monitor) instead of minting a fresh timestamp; fresh runs and
    explicit/absent resume paths keep getting new dirs."""
    from damc_tpu.cli.common import make_log_dir
    from damc_tpu.utils.config import _r, preset

    def cfg_with(resume_path):
        return _r(
            preset("cifar10"), "train",
            log_path=str(tmp_path), resume_path=resume_path,
        )

    cfg = cfg_with("auto")
    first = make_log_dir(cfg)  # no prior runs: auto creates a fresh dir
    assert os.path.dirname(first) == str(tmp_path / "cifar10")
    assert os.path.exists(os.path.join(first, "config.json"))

    older = tmp_path / "cifar10" / "20200101_000000"
    older.mkdir()  # stale run predating `first`
    # 15-char NON-timestamp dirs (sort after digit-leading stamps) must
    # never be adopted as the resume target.
    (tmp_path / "cifar10" / "baseline_sweep1").mkdir()

    assert make_log_dir(cfg) == first  # auto: newest run dir, not a new one
    # config.json provenance is first-writer-wins (original run's config).
    assert os.path.exists(os.path.join(first, "config.json"))

    # Auto-relaunch with CHANGED hyperparameters: original config.json is
    # untouched, the new config lands in config.resume.<stamp>.json.
    changed = cfg_with("auto")
    import dataclasses

    changed = dataclasses.replace(
        changed, train=dataclasses.replace(changed.train, e_energy_reg=2e-4)
    )
    assert make_log_dir(changed) == first
    import glob
    import json

    resumes = glob.glob(os.path.join(first, "config.resume.*.json"))
    assert len(resumes) == 1
    assert json.load(open(resumes[0]))["train"]["e_energy_reg"] == 2e-4
    assert json.load(open(os.path.join(first, "config.json")))["train"][
        "e_energy_reg"
    ] != 2e-4
    # Identical-config relaunch adds no extra provenance file.
    assert make_log_dir(cfg) == first
    assert len(glob.glob(os.path.join(first, "config.resume.*.json"))) == 1

    fresh = make_log_dir(cfg_with(None))  # no auto: always a new timestamped dir
    assert fresh != first and os.path.dirname(fresh) == str(tmp_path / "cifar10")

    explicit = make_log_dir(cfg_with(os.path.join(first, "ckpt", "100")))
    assert explicit not in (first, fresh)


def test_make_log_dir_concurrent_fresh_launches_get_distinct_dirs(tmp_path):
    """Two fresh launches in the same wall-clock second must not adopt one
    run dir (they would interleave metrics.jsonl writes and clobber each
    other's checkpoints). The claim is makedirs(exist_ok=False) itself — an
    exists() pre-check alone is a TOCTOU window this race test regresses."""
    import threading

    from damc_tpu.cli.common import make_log_dir
    from damc_tpu.utils.config import _r, preset

    cfg = _r(preset("cifar10"), "train", log_path=str(tmp_path), resume_path=None)
    n = 8
    dirs, errs = [None] * n, []
    start = threading.Barrier(n)

    def launch(i):
        try:
            start.wait(timeout=30)
            dirs[i] = make_log_dir(cfg)
        except Exception as e:  # surfaced below
            errs.append(e)

    threads = [threading.Thread(target=launch, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs, errs
    assert len(set(dirs)) == n, f"run-dir collision: {sorted(dirs)}"
    for d in dirs:
        assert os.path.isdir(d)


def test_make_log_dir_concurrent_auto_fresh_launches_converge_on_one_dir(tmp_path):
    """--resume_path auto with an EXISTING dataset dir but no adoptable run
    is still a fresh launch and must take the exclusive claim — but `auto`
    means "attach to the newest run", so concurrently double-started
    relaunches (the preemption-recovery path) must CONVERGE on exactly one
    run dir: one claims it, the rest adopt it on collision. The failure
    modes regressed here are (a) the pre-fix fallthrough where `isdir(base)
    and not runs` skipped the claim loop (un-owned shared dir), and (b)
    second-bumping in auto mode, which would split the relaunches across
    two half-runs."""
    import threading

    from damc_tpu.cli.common import make_log_dir
    from damc_tpu.utils.config import _r, preset

    cfg = _r(preset("cifar10"), "train", log_path=str(tmp_path), resume_path="auto")
    # base exists but holds no run-shaped (timestamp) dirs.
    (tmp_path / "cifar10" / "baseline_sweep1").mkdir(parents=True)

    n = 8
    dirs, errs = [None] * n, []
    start = threading.Barrier(n)

    def launch(i):
        try:
            start.wait(timeout=30)
            dirs[i] = make_log_dir(cfg)
        except Exception as e:  # surfaced below
            errs.append(e)

    threads = [threading.Thread(target=launch, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs, errs
    assert len(set(dirs)) == 1, f"auto relaunch split-brain: {sorted(set(dirs))}"
    assert os.path.isdir(dirs[0])
    # The converged dir is run-shaped (adoptable by the NEXT auto relaunch),
    # and the stray non-run dir was never adopted.
    name = os.path.basename(dirs[0])
    assert len(name) == 15 and name[8] == "_" and (name[:8] + name[9:]).isdigit()
