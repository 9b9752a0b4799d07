"""Tracing / profiling harness (SURVEY.md section 5).

The reference has no in-repo tracing and relies on platform machinery; the
TPU-native equivalents are the JAX profiler (XLA trace viewer) and a
``block_until_ready`` wall-clock harness, wrapped here so users and benchmarks
share one entry point.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture an XLA profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, warmup=2, reps=10, **kwargs):
    """Median wall-clock seconds of ``fn(*args, **kwargs)`` with full device
    synchronization per call (compile excluded via warmup calls)."""
    for _ in range(max(1, warmup)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
