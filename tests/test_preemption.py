"""Preemption-safe training: SIGTERM checkpoints and exits cleanly, and
`resume_path='auto'` continues from the newest checkpoint — the elastic-
recovery aux subsystem (SURVEY.md §5: the reference has none; preemptible
TPU VMs get SIGTERM before shutdown)."""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

_DRIVER = """
import sys, dataclasses
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from damc_tpu.train.gen_recon import train_gen_recon
from damc_tpu.utils import preset

cfg = preset("cifar10")
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, nz=8, ngf=4, nif=4, nxemb=16, ntemb=8),
    diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
    mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
    train=dataclasses.replace(
        cfg.train, batch_size=8, q_updates=1, print_every=1, plot_every=0,
        ckpt_every=0, eval_every=0, resume_path={resume!r},
    ),
)
imgs = (np.random.RandomState(0).rand(64, 32, 32, 3) * 255).astype(np.uint8)
state = train_gen_recon(cfg, imgs, iterations={iters}, log_dir={log_dir!r}, seed=0)
print("FINAL_STEP", int(state.step))
"""


def _spawn(repo, log_dir, iters, resume=""):
    code = _DRIVER.format(repo=repo, log_dir=log_dir, iters=iters, resume=resume)
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo,
    )


def test_sigterm_checkpoints_and_auto_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log_dir = str(tmp_path / "run")
    metrics = os.path.join(log_dir, "metrics.jsonl")

    proc = _spawn(repo, log_dir, iters=100000)
    try:
        # Wait until a few iterations have logged, then preempt.
        # Generous: the subprocess pays a cold JAX compile (~2.5 min on an
        # idle 1-core CPU box, much longer when CI shares the core).
        deadline = time.time() + 600
        while time.time() < deadline:
            if os.path.exists(metrics) and sum(1 for _ in open(metrics)) >= 3:
                break
            if proc.poll() is not None:
                raise AssertionError(f"driver died early:\n{proc.stdout.read()}")
            time.sleep(0.5)
        else:
            raise AssertionError("driver never reached 3 iterations")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "checkpointed to" in out, out

    ckpt_dir = os.path.join(log_dir, "ckpt")
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, "no preemption checkpoint written"
    saved = max(steps)
    assert saved >= 3

    # Resume leg: picks up from the newest checkpoint and runs to completion.
    proc2 = _spawn(repo, log_dir, iters=saved + 2, resume="auto")
    try:
        out2, _ = proc2.communicate(timeout=240)
    finally:
        if proc2.poll() is None:
            proc2.kill()
            proc2.wait()
    assert proc2.returncode == 0, out2
    assert f"resumed from {os.path.join(ckpt_dir, str(saved))}" in out2, out2
    assert f"FINAL_STEP {saved + 2}" in out2, out2
