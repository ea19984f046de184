"""Preemption-safe training: convert SIGTERM into the interrupt-checkpoint
path.

The reference only handles Ctrl-C (`nntts/bin/train.py:250-253` saves a
checkpoint on KeyboardInterrupt). On TPU fleets the relevant signal is
SIGTERM: preemptible/spot TPU VMs and managed schedulers (GKE, Borg-style
eviction, slurm's default kill) deliver SIGTERM with a grace window before
SIGKILL. Both trainers wrap their step loop in `convert_sigterm()`, so a
preemption raises KeyboardInterrupt in the main thread and the existing
except-save path writes a resumable checkpoint (`--resume` restores step,
optimizer, and scheduler state exactly — `train/checkpoint.py`).

Signal handlers are process-global and only installable from the main
thread; when called elsewhere (e.g. a test worker thread) this degrades to
a no-op rather than failing.
"""

from __future__ import annotations

import contextlib
import logging
import signal
import threading

log = logging.getLogger(__name__)


@contextlib.contextmanager
def convert_sigterm():
    """Within the context, SIGTERM raises KeyboardInterrupt in the main
    thread (once; a second SIGTERM falls through to the default handler so
    a stuck save cannot block eviction). Restores the previous handler on
    exit."""
    if threading.current_thread() is not threading.main_thread():
        yield
        return

    fired = False

    def handler(signum, frame):
        nonlocal fired
        if fired:
            signal.signal(signal.SIGTERM, signal.SIG_DFL)
            signal.raise_signal(signal.SIGTERM)
            return
        fired = True
        log.warning("SIGTERM received: checkpointing before shutdown")
        raise KeyboardInterrupt

    prev = signal.signal(signal.SIGTERM, handler)
    try:
        yield
    finally:
        signal.signal(signal.SIGTERM, prev)
