"""Per-phase profiling helpers.

The reference's instrumentation is four host clock() buckets printed at
exit (/root/reference/src/main.cpp:371-372, 695-700); the CLI reproduces
that summary.  This module adds JAX-native tracing: wrap any region in
`trace_to(dir)` and inspect it with TensorBoard / xprof, or time jitted
callables with device synchronization.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_to(log_dir: str):
    """jax.profiler trace context (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall time of a jitted callable with block_until_ready."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
