"""Graceful-preemption support for long TPU runs.

Preemptible/spot TPU VMs receive SIGTERM shortly before shutdown. The
training drivers run under `graceful_shutdown()`: the first SIGTERM (or
SIGINT) sets a flag the loop checks at each iteration boundary, the driver
saves a full-state checkpoint and returns cleanly, and
`--resume_path auto` picks the run back up from the newest checkpoint.
A second signal falls through to the previous handler (so a double Ctrl-C
still kills a hung run). The reference has no recovery story at all
(SURVEY.md §5: "failure detection / elastic recovery: none").
"""

from __future__ import annotations

import contextlib
import signal
import threading


class ShutdownFlag:
    """Set by the signal handler; polled by the training loop."""

    def __init__(self):
        self._event = threading.Event()
        self.signum: int | None = None

    def __bool__(self) -> bool:
        return self._event.is_set()

    def set(self, signum: int) -> None:
        self.signum = signum
        self._event.set()


@contextlib.contextmanager
def graceful_shutdown(signals=(signal.SIGTERM, signal.SIGINT)):
    """Context manager yielding a ShutdownFlag that trips on SIGTERM/SIGINT.

    Restores the previous handlers on exit. If not in the main thread (where
    Python forbids signal handler installation), yields a flag that never
    trips — the feature degrades to a no-op.
    """
    flag = ShutdownFlag()
    if threading.current_thread() is not threading.main_thread():
        yield flag
        return

    previous = {}

    def _handler(signum, frame):
        if flag:  # second signal: defer to the original behavior
            handler = previous.get(signum)
            if callable(handler):
                handler(signum, frame)
                return
            signal.signal(signum, handler or signal.SIG_DFL)
            signal.raise_signal(signum)
            return
        flag.set(signum)

    try:
        for s in signals:
            previous[s] = signal.signal(s, _handler)
        yield flag
    finally:
        for s, h in previous.items():
            signal.signal(s, h)
