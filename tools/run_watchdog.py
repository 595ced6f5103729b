"""Heartbeat watchdog for long device-bound runs: kill-and-resume on stall.

Motivation (observed live, round 3): a 100k-iteration TPU endurance run
hard-stalled at iter 35,450 — process alive, zero CPU, main thread parked in
a futex wait inside a wedged device-tunnel read, log stale for 80 minutes.
No in-process mechanism can recover this: the SIGTERM-at-iteration-boundary
preemption handler (utils/preemption.py) never runs because the loop never
reaches a boundary, and watchdog threads inside the process can't unwedge a
blocked device call. The only cure is external: kill the process and relaunch
from the newest checkpoint.

This supervisor does exactly that:

  python tools/run_watchdog.py --heartbeat <run_dir>/metrics.jsonl \
      --stale-seconds 900 --max-restarts 3 -- \
      python tools/diagnose_cd_divergence.py run ... --resume --log_dir <run_dir>

* The COMMAND after `--` is used for every (re)launch, so pass an idempotent
  resume spec: `--resume` / `--resume_path auto` resolves to the newest
  checkpoint and to a fresh start when none exists yet
  (`train/driver_utils.py::resolve_resume_path`).
* The heartbeat is any file the run appends to (metrics.jsonl is written
  every `print_every` iterations). Staleness = now - mtime.
* On staleness while the child is alive: SIGTERM (gives the graceful
  preemption checkpoint a chance in the non-wedged case), a grace period,
  then SIGKILL. Only the exact child PID is ever signalled.
* Child exits 0 -> done. Nonzero exit or a stall-kill -> relaunch, up to
  --max-restarts times. A restart only counts against the budget if the
  previous incarnation never advanced the heartbeat (made no progress);
  progress resets the budget, so a run that stalls every few hours still
  finishes while a crash-loop stops quickly. Progress means the last
  parsed ``{"step": N}`` in the heartbeat ADVANCED (a resumed incarnation
  that merely re-logs its resume step before wedging again does not refill
  the budget); for non-JSONL heartbeats it falls back to file growth.
* SIGTERM/SIGINT to the watchdog terminates the child (SIGTERM -> grace ->
  SIGKILL) before exiting, so killing the supervisor cannot orphan a
  training process that would then race a relaunched one for the run dir.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time


def heartbeat_mtime(path: str):
    """The heartbeat file's mtime, or None while it does not exist."""
    try:
        return os.path.getmtime(path)
    except OSError:
        return None


def heartbeat_state(path: str):
    """(last_step, size) of the heartbeat: the ``step`` field of the last
    parseable JSON line in the final 8 KiB (None when the tail holds no such
    line), and the file size. (None, None) while the file does not exist."""
    try:
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            f.seek(max(0, size - 8192))
            tail = f.read().decode("utf-8", "replace")
    except OSError:
        return (None, None)
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and isinstance(rec.get("step"), (int, float)):
            return (rec["step"], size)
    return (None, size)


class _Interrupted(Exception):
    """Raised by the supervisor's signal handlers to unwind into cleanup."""


def terminate(proc: subprocess.Popen, grace_seconds: float, log=print) -> None:
    """SIGTERM -> grace -> SIGKILL, exact PID only."""
    if proc.poll() is not None:
        return
    log(f"[watchdog] sending SIGTERM to pid {proc.pid}")
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=grace_seconds)
        return
    except subprocess.TimeoutExpired:
        pass
    log(f"[watchdog] pid {proc.pid} survived SIGTERM {grace_seconds:.0f}s; SIGKILL")
    proc.kill()
    proc.wait()


def supervise(
    cmd,
    heartbeat: str,
    stale_seconds: float,
    max_restarts: int = 3,
    poll_seconds: float = 10.0,
    grace_seconds: float = 60.0,
    startup_grace_seconds: float = None,
    log=print,
) -> int:
    """Run `cmd` under heartbeat supervision. Returns the final exit code
    (0 on success; the child's last nonzero code when the restart budget is
    exhausted; 1 when the budget is exhausted by stalls).

    Until the CURRENT incarnation's first beat (an mtime after its launch;
    a pre-existing stale file from the killed predecessor does not count),
    staleness is measured from launch against `startup_grace_seconds`
    (default 4x stale_seconds): startup legitimately runs long before the
    first heartbeat — interpreter + framework import, dataset synthesis,
    and the first device compile are all minutes-scale on the targets this
    supervises."""
    if startup_grace_seconds is None:
        startup_grace_seconds = 4.0 * stale_seconds
    restarts_left = max_restarts
    attempt = 0
    proc = None

    def _on_signal(signum, frame):
        raise _Interrupted(signum)

    # Forward operator/preemption signals to the child: without this a
    # SIGTERM to the watchdog kills only the supervisor and orphans the
    # training process (which would then race any relaunch for the run dir).
    # signal.signal is main-thread-only; tests driving supervise() from a
    # worker thread just keep Python's defaults.
    old_handlers = {}
    if threading.current_thread() is threading.main_thread():
        for sig in (signal.SIGTERM, signal.SIGINT):
            old_handlers[sig] = signal.signal(sig, _on_signal)
    try:
        while True:
            attempt += 1
            launched_at = time.time()
            start_step, start_size = heartbeat_state(heartbeat)
            log(f"[watchdog] launch #{attempt}: {' '.join(cmd)}")
            proc = subprocess.Popen(cmd)
            stalled = False
            while True:
                try:
                    proc.wait(timeout=poll_seconds)
                    break
                except subprocess.TimeoutExpired:
                    pass
                # Only a beat from THIS incarnation counts: after a stall-kill
                # the file exists but is stale by construction (the previous
                # child stopped writing it) — judging a fresh child by its
                # predecessor's mtime would kill it before its first beat.
                mtime = heartbeat_mtime(heartbeat)
                if mtime is not None and mtime > launched_at:
                    age, limit, label = time.time() - mtime, stale_seconds, "stale"
                else:
                    age, limit, label = (
                        time.time() - launched_at, startup_grace_seconds,
                        "no beat from this incarnation",
                    )
                if age > limit:
                    log(
                        f"[watchdog] heartbeat {heartbeat} {label} "
                        f">{limit:.0f}s at pid {proc.pid}; killing for restart"
                    )
                    terminate(proc, grace_seconds, log)
                    stalled = True
                    break
            code = proc.returncode
            if not stalled and code == 0:
                log(f"[watchdog] child exited cleanly after attempt #{attempt}")
                return 0
            # Progress = the logged step ADVANCED. A resumed incarnation that
            # only re-logs its resume step (<= the predecessor's last step)
            # before wedging again must not refill the budget, or a
            # deterministic wedge-after-resume loops forever. Heartbeats
            # without parseable steps fall back to file growth.
            end_step, end_size = heartbeat_state(heartbeat)
            if end_step is not None:
                progressed = start_step is None or end_step > start_step
            elif end_size is not None:
                progressed = start_size is None or end_size != start_size
            else:
                progressed = False
            if progressed:
                restarts_left = max_restarts  # forward progress refills the budget
            else:
                restarts_left -= 1
            why = "stall" if stalled else f"exit code {code}"
            if restarts_left < 0:
                log(f"[watchdog] {why}, restart budget exhausted; giving up")
                return 1 if stalled else int(code or 1)
            log(f"[watchdog] {why}; restarting ({restarts_left} budget left)")
    except _Interrupted as exc:
        signum = exc.args[0]
        log(f"[watchdog] received signal {signum}; terminating child before exit")
        if proc is not None:
            terminate(proc, grace_seconds, log)
        return 128 + int(signum)
    finally:
        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        usage="run_watchdog.py [options] -- COMMAND ...",
    )
    ap.add_argument("--heartbeat", required=True,
                    help="file the run appends to (e.g. <run_dir>/metrics.jsonl)")
    ap.add_argument("--stale-seconds", type=float, default=900.0,
                    help="kill the child when the heartbeat is older than this")
    ap.add_argument("--max-restarts", type=int, default=3,
                    help="no-progress restarts allowed before giving up")
    ap.add_argument("--poll-seconds", type=float, default=10.0)
    ap.add_argument("--grace-seconds", type=float, default=60.0,
                    help="SIGTERM->SIGKILL grace (graceful ckpt window)")
    ap.add_argument("--startup-grace-seconds", type=float, default=None,
                    help="staleness allowance while the heartbeat file does "
                    "not exist yet (default 4x --stale-seconds)")
    argv = sys.argv[1:] if argv is None else argv
    if "--" not in argv:
        ap.error("separate the supervised command with `--`")
    split = argv.index("--")
    args = ap.parse_args(argv[:split])
    cmd = argv[split + 1:]
    if not cmd:
        ap.error("empty command after `--`")
    return supervise(
        cmd,
        heartbeat=args.heartbeat,
        stale_seconds=args.stale_seconds,
        max_restarts=args.max_restarts,
        poll_seconds=args.poll_seconds,
        grace_seconds=args.grace_seconds,
        startup_grace_seconds=args.startup_grace_seconds,
    )


if __name__ == "__main__":
    sys.exit(main())
