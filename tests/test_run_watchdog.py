"""The heartbeat watchdog (tools/run_watchdog.py): stall-kill + resume
semantics, driven with real subprocesses at sub-second timescales.

Models the failure observed live in round 3: a device-tunnel wedge leaves
the training process alive but making no progress — only an external
kill-and-resume recovers it (artifacts/CD_DIVERGENCE.md, 100k run)."""

import os
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def write_child(tmp_path, body: str) -> list:
    """A python child script; returns the argv to launch it. `-S` skips
    sitecustomize (which imports jax and takes seconds on this box) so the
    stdlib-only children start in milliseconds and the tests can use
    sub-second watchdog timings."""
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent(body))
    return [sys.executable, "-S", str(script)]


def test_stalled_child_is_killed_and_resumed_run_completes(tmp_path):
    """Incarnation 1 heartbeats briefly then wedges (sleeps forever,
    ignoring nothing — SIGTERM kills it). Incarnation 2 sees the state file
    ('checkpoint') and exits 0. The supervisor must finish with 0."""
    from run_watchdog import supervise

    hb = tmp_path / "metrics.jsonl"
    state = tmp_path / "ckpt"
    cmd = write_child(
        tmp_path,
        f"""
        import os, time
        hb, state = {str(hb)!r}, {str(state)!r}
        if os.path.exists(state):      # resumed incarnation
            open(hb, "a").write("resumed\\n")
            raise SystemExit(0)
        open(state, "w").write("35000")  # 'checkpoint' then wedge
        for _ in range(3):
            open(hb, "a").write("beat\\n")
            time.sleep(0.1)
        time.sleep(3600)               # the tunnel wedge
        """,
    )
    rc = supervise(
        cmd, heartbeat=str(hb), stale_seconds=1.0, max_restarts=2,
        poll_seconds=0.2, grace_seconds=1.0, log=lambda *a: None,
    )
    assert rc == 0
    assert "resumed" in hb.read_text()


def test_crash_loop_exhausts_budget_and_reports_child_code(tmp_path):
    """A child that dies instantly without progress must stop after
    max_restarts relaunches and surface its exit code."""
    from run_watchdog import supervise

    hb = tmp_path / "metrics.jsonl"
    count = tmp_path / "launches"
    cmd = write_child(
        tmp_path,
        f"""
        open({str(count)!r}, "a").write("x")
        raise SystemExit(7)
        """,
    )
    rc = supervise(
        cmd, heartbeat=str(hb), stale_seconds=5.0, max_restarts=2,
        poll_seconds=0.1, grace_seconds=0.5, log=lambda *a: None,
    )
    assert rc == 7
    # initial launch + 2 budgeted restarts
    assert len(count.read_text()) == 3


def test_progress_refills_restart_budget(tmp_path):
    """A run that makes forward progress between failures must not be
    budget-limited: each productive incarnation resets the allowance."""
    from run_watchdog import supervise

    hb = tmp_path / "metrics.jsonl"
    count = tmp_path / "launches"
    # Each incarnation advances the heartbeat, then crashes; the 4th exits 0.
    # With max_restarts=1 this only completes if progress refills the budget.
    cmd = write_child(
        tmp_path,
        f"""
        import os, time
        n = len(open({str(count)!r}).read()) if os.path.exists({str(count)!r}) else 0
        open({str(count)!r}, "a").write("x")
        time.sleep(0.05)               # ensure a strictly newer mtime
        open({str(hb)!r}, "a").write("beat\\n")
        raise SystemExit(0 if n >= 3 else 3)
        """,
    )
    rc = supervise(
        cmd, heartbeat=str(hb), stale_seconds=30.0, max_restarts=1,
        poll_seconds=0.1, grace_seconds=0.5, log=lambda *a: None,
    )
    assert rc == 0
    assert len(count.read_text()) == 4


def test_same_step_relog_does_not_refill_budget(tmp_path):
    """A resumed incarnation that only re-logs its resume step (a JSONL
    heartbeat line with step <= the predecessor's) before dying again must
    NOT count as progress — otherwise a deterministic wedge-after-resume
    relaunches forever and --max-restarts never engages."""
    from run_watchdog import supervise

    hb = tmp_path / "metrics.jsonl"
    count = tmp_path / "launches"
    hb.write_text('{"step": 5000, "phase": "train"}\n')
    cmd = write_child(
        tmp_path,
        f"""
        open({str(count)!r}, "a").write("x")
        # resume re-logs the checkpoint step, then 'wedges' (crashes here)
        open({str(hb)!r}, "a").write('{{"step": 5000, "phase": "train"}}\\n')
        raise SystemExit(3)
        """,
    )
    rc = supervise(
        cmd, heartbeat=str(hb), stale_seconds=30.0, max_restarts=1,
        poll_seconds=0.1, grace_seconds=0.5, log=lambda *a: None,
    )
    assert rc == 3
    # initial launch + exactly the budgeted 1 restart, despite mtime changes
    assert len(count.read_text()) == 2


def test_advancing_step_refills_budget(tmp_path):
    """JSONL heartbeats whose step advances between incarnations refill the
    budget (the step-aware analog of test_progress_refills_restart_budget)."""
    from run_watchdog import supervise

    hb = tmp_path / "metrics.jsonl"
    count = tmp_path / "launches"
    cmd = write_child(
        tmp_path,
        f"""
        import os
        n = len(open({str(count)!r}).read()) if os.path.exists({str(count)!r}) else 0
        open({str(count)!r}, "a").write("x")
        open({str(hb)!r}, "a").write('{{"step": %d}}\\n' % (1000 * (n + 1)))
        raise SystemExit(0 if n >= 3 else 3)
        """,
    )
    rc = supervise(
        cmd, heartbeat=str(hb), stale_seconds=30.0, max_restarts=1,
        poll_seconds=0.1, grace_seconds=0.5, log=lambda *a: None,
    )
    assert rc == 0
    assert len(count.read_text()) == 4


def test_sigterm_to_watchdog_terminates_child(tmp_path):
    """Killing the supervisor must not orphan the training child: SIGTERM to
    the watchdog process forwards termination to the child before exiting."""
    import signal
    import subprocess
    import time

    hb = tmp_path / "metrics.jsonl"
    child_pid_file = tmp_path / "child.pid"
    child = write_child(
        tmp_path,
        f"""
        import os, time
        open({str(child_pid_file)!r}, "w").write(str(os.getpid()))
        time.sleep(3600)
        """,
    )
    watchdog = subprocess.Popen(
        [sys.executable, "-S", os.path.join(REPO, "tools", "run_watchdog.py"),
         "--heartbeat", str(hb), "--stale-seconds", "3600",
         "--grace-seconds", "1", "--"] + child,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 20
    while not child_pid_file.exists() and time.time() < deadline:
        time.sleep(0.05)
    assert child_pid_file.exists(), "child never launched"
    child_pid = int(child_pid_file.read_text())
    watchdog.send_signal(signal.SIGTERM)
    assert watchdog.wait(timeout=20) == 128 + signal.SIGTERM
    # the exact child PID must be gone (or a zombie reaped by init shortly)
    for _ in range(100):
        try:
            os.kill(child_pid, 0)
        except ProcessLookupError:
            break
        time.sleep(0.05)
    else:
        pytest.fail(f"child pid {child_pid} still alive after watchdog SIGTERM")


def test_cli_requires_separator(tmp_path):
    from run_watchdog import main

    with pytest.raises(SystemExit):
        main(["--heartbeat", str(tmp_path / "hb")])
