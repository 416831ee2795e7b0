"""Timing decorator (ref: GPSat/decorators.py:6-47), plus a jax.profiler
trace context for the TPU build (SURVEY.md §5 observability upgrade)."""

from __future__ import annotations

import contextlib
import time
from functools import wraps


def timer(func):
    """Print "'name': X.xxx seconds" per call."""

    @wraps(func)
    def caller(*args, **kwargs):
        t0 = time.perf_counter()
        result = func(*args, **kwargs)
        t1 = time.perf_counter()
        print(f"'{func.__name__}': {t1 - t0:.3f} seconds")
        return result

    return caller


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/gpsat_tpu_trace"):
    """jax.profiler trace around device work — view in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
