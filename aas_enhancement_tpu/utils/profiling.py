"""Profiling + debug harness (SURVEY.md §5 "Tracing/profiling", "Race detection").

Reference had python timing prints; here:
- `trace(dir)`: context manager around `jax.profiler.trace` -> Perfetto/XProf dump
- `timed(fn)`: wall-clock a jitted callable with hard sync (through the remote
  execution tunnel, block_until_ready alone is not a completion barrier — fetch a
  scalar instead)
- `enable_debug()`: NaN checking + tracer-leak checking for debug runs
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aas_trace"):
    """Perfetto/XProf trace of everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _sync(result):
    leaf = jax.tree.leaves(result)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])


def timed(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean wall-clock ms per call of fn(*args), hard-synced."""
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / iters * 1000.0


def enable_debug() -> None:
    """NaN + tracer-leak checking (debug runs only; disables some fusions)."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_check_tracer_leaks", True)
