"""Profiling hooks.

The reference's tracing story is chrono around the queue submit plus the
`-n` amortization flag (VkResample.cpp:1270-1278, SURVEY §5.1).  We keep
those semantics in pipeline/timing.py and add what the reference lacks: an
optional device profiler trace (`-profile DIR` on the CLI) capturing XLA
op-level timelines viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def maybe_trace(trace_dir):
    """Context manager: jax.profiler.trace(dir) when trace_dir is set,
    no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(trace_dir)):
        yield
