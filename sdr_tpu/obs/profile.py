"""Profiler hooks (jax.profiler) — the tracing subsystem.

The reference has no tracing/profiling anywhere (SURVEY.md §5). Here
profiling is a context manager around any framework call; traces are
Perfetto/XProf-compatible and viewable with `xprof` or
ui.perfetto.dev.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str, annotate: str | None = None):
    """Capture a device trace of the enclosed block into ``log_dir``.

    Usage:
        with obs.trace("/tmp/sdr_trace"):
            fn(key)  # any jitted framework call
    """
    jax.profiler.start_trace(log_dir)
    try:
        if annotate:
            with jax.profiler.TraceAnnotation(annotate):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()
