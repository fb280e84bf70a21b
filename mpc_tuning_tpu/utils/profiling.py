"""Profiling / observability helpers.

The reference's only instrumentation is wall-clock tic/toc around tuning
calls (WoodBerry.m:155-157) and disp progress lines (SURVEY.md section 5).
Here: solve-rate counters with honest device synchronization, and optional
jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import jax.numpy as jnp

__all__ = ["Stopwatch", "rate_of", "trace"]


@dataclasses.dataclass
class Stopwatch:
    """tic/toc with device sync (block_until_ready is not sufficient on
    tunneled backends; we force a scalar readback)."""

    t0: float = 0.0

    def tic(self):
        self.t0 = time.perf_counter()
        return self

    def toc(self, sync_on=None) -> float:
        if sync_on is not None:
            float(jnp.sum(sync_on))  # forces execution + transfer
        return time.perf_counter() - self.t0


def rate_of(fn, *args, reps: int = 3, items: int = 1):
    """(items/sec, seconds_per_call) for a device function returning arrays."""
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    sw = Stopwatch().tic()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    dt = sw.toc(sync_on=leaf) / reps
    return items / dt, dt


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mpc_tuning_tpu_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
