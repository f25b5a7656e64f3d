"""Tracing / profiling helpers (the aux subsystem the reference lacks,
SURVEY.md §5.1): jax.profiler trace scopes + block_until_ready timing."""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace_context(name: str, trace_dir: Optional[str] = None):
    """Named profiler scope; when trace_dir is set, also captures a full
    device trace viewable in TensorBoard/Perfetto."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Wall-time a jitted callable with proper device sync.

    Returns (mean_seconds, last_result)."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / iters, result


def cost_analysis(fn: Callable, *args, **kwargs):
    """Per-kernel cost estimate via jax.stages (SURVEY.md §5.1)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    return lowered.compile().cost_analysis()
