"""Cross-process mutex for the (single) real TPU chip.

The bench, the native-driver parity check, and any user CLI run share one
tunnel chip; concurrent compiles/executions time each other out. Every
entry point that touches the real chip takes this advisory file lock first
(CPU-only test runs never do). Re-entrant within a process so an outer
holder (e.g. the pytest wrapper around ``scripts/check_md_driver.py``) can
spawn locked children via the inherited environment marker.
"""

from __future__ import annotations

import contextlib
import errno
import fcntl
import os
import time

LOCK_PATH = os.environ.get("ALLEGRO_CHIP_LOCK", "/tmp/allegro_tpu_chip.lock")
_HELD_ENV = "ALLEGRO_CHIP_LOCK_HELD"


@contextlib.contextmanager
def chip_lock(timeout: float = 3600.0, poll: float = 2.0):
    """Acquire the real-chip lock (blocking, with timeout).

    No-op when this process tree already holds it (the holder exports
    ``ALLEGRO_CHIP_LOCK_HELD`` so locked subprocesses inherit ownership).
    """
    if os.environ.get(_HELD_ENV) == "1":
        yield
        return
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    deadline = time.monotonic() + timeout
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError as e:
                if e.errno not in (errno.EAGAIN, errno.EACCES):
                    raise
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"could not acquire chip lock {LOCK_PATH} in {timeout}s"
                    ) from None
                time.sleep(poll)
        os.environ[_HELD_ENV] = "1"
        try:
            yield
        finally:
            os.environ.pop(_HELD_ENV, None)
            fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)
