"""Profiling hooks (SURVEY.md §5: the reference delegates perf work to
torch.compile; here we expose ``jax.profiler`` traces directly)."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Context manager: capture a jax.profiler trace when ``log_dir`` is set.

    View with TensorBoard / xprof. No-op when ``log_dir`` is None.
    """
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
