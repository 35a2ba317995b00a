"""Device profiling helpers.

The reference's observability is wall-clock prints (`@timing`,
utils.py:32-40).  On TPU that story is `jax.profiler`: this module wraps it
in a context manager that captures a trace viewable in
TensorBoard/Perfetto, plus a block-until-ready timing loop for honest
latency numbers (XLA dispatch is asynchronous; see utils/timing.py Timer).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import numpy as np

__all__ = ["trace", "measure"]


@contextmanager
def trace(log_dir: str = "runs/profile"):
    """Capture a device trace: ``with trace('runs/profile'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def measure(fn, *args, reps: int = 5, warmup: int = 1, transfer=False):
    """Best-of-``reps`` latency of ``fn(*args)`` in milliseconds.

    With ``transfer`` the result is pulled to host each rep (forces full
    synchronization even on runtimes where block_until_ready is unreliable);
    otherwise ``jax.block_until_ready`` is used.
    """
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
        if transfer:
            jax.tree.map(np.asarray, out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        if transfer:
            jax.tree.map(np.asarray, out)
        else:
            jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3
