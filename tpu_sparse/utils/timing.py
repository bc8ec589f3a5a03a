"""Timing and profiling utilities.

The reference's observability is ad-hoc wall timing with cuda.synchronize
(SURVEY.md §5: benchmark.py:238-243, test timings). TPU equivalents here:

* `force(tree)` — actually wait for device completion. On remote TPU
  runtimes `jax.block_until_ready` can return before execution finishes;
  only a device→host transfer is a reliable fence, so this fetches one
  scalar per output tree.
* `wall_time(fn, *args)` — per-call wall time including dispatch, median
  of N.
* `per_iter_time(op, v)` — per-application cost of a linear operator,
  measured as the slope between two chained `fori_loop` programs so fixed
  dispatch latency cancels out.
* `trace(path)` — context manager around `jax.profiler` for XProf traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def force(tree: Any) -> float:
    """Block until ``tree`` is computed; returns a checksum scalar."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(jnp.abs(leaf)))


def wall_time(fn: Callable, *args, warmup: int = 2, iters: int = 5) -> float:
    """Median wall seconds per call, dispatch included, completion forced."""
    for _ in range(warmup):
        force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def chain_time(op: Callable, v: Any, K: int, reps: int = 3) -> float:
    """Total wall seconds for K dependent applications of ``op`` in one
    compiled program (min over reps)."""
    g = jax.jit(lambda x: jnp.sum(lax.fori_loop(0, K, lambda i, y: op(y), x)))
    float(g(v))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(v))
        times.append(time.perf_counter() - t0)
    return min(times)


def per_iter_time(op: Callable, v: Any, K1: int = 5, K2: int = 50) -> float:
    """Per-application seconds of a (shape-preserving) operator, with fixed
    dispatch latency cancelled via the K2−K1 slope."""
    t1 = chain_time(op, v, K1)
    t2 = chain_time(op, v, K2)
    return max((t2 - t1) / (K2 - K1), 1e-12)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_sparse_trace"):
    """Capture an XProf trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
