"""Cross-process mutex for the (single) real TPU chip.

The bench, the native-driver parity check, and any user CLI run share one
tunnel chip; concurrent compiles/executions time each other out. Every
entry point that touches the real chip takes this advisory file lock first
(CPU-only test runs never do). Re-entrant within a process tree: the holder
exports ``ALLEGRO_CHIP_LOCK_HELD`` so locked subprocesses inherit ownership.
"""

from __future__ import annotations

import errno
import fcntl
import os
import time

LOCK_PATH = os.environ.get("ALLEGRO_CHIP_LOCK", "/tmp/allegro_tpu_chip.lock")
_HELD_ENV = "ALLEGRO_CHIP_LOCK_HELD"


class chip_lock:
    """Context manager acquiring the real-chip lock (blocking, with timeout).

    Plain class (not a generator) so flat scripts can ``__enter__`` it and
    rely on process exit to release the flock without finalizer noise.
    """

    def __init__(self, timeout: float = 3600.0, poll: float = 2.0):
        self.timeout = timeout
        self.poll = poll
        self._fd = None
        self._owner = False

    def __enter__(self):
        if os.environ.get(_HELD_ENV) == "1":
            return self
        fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError as e:
                if e.errno not in (errno.EAGAIN, errno.EACCES):
                    os.close(fd)
                    raise
                if time.monotonic() > deadline:
                    os.close(fd)
                    raise TimeoutError(
                        f"could not acquire chip lock {LOCK_PATH} in "
                        f"{self.timeout}s"
                    ) from None
                time.sleep(self.poll)
        self._fd = fd
        self._owner = True
        os.environ[_HELD_ENV] = "1"
        return self

    def __exit__(self, *exc):
        if self._owner:
            try:
                os.environ.pop(_HELD_ENV, None)
                fcntl.flock(self._fd, fcntl.LOCK_UN)
                os.close(self._fd)
            except Exception:
                pass
            self._fd = None
            self._owner = False
        return False
