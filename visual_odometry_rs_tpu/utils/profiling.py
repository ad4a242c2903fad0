"""Tracing / profiling hooks (SURVEY §5).

The reference has no profiling beyond a criterion bench harness; here:
- ``trace(dir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution.
- ``annotate(name)``: named trace region for host-side phases.
- ``nan_debug()``: enable ``jax_debug_nans`` (the analog of the reference's
  "sanitizer" rigor — fail fast on NaN instead of silently degrading).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def nan_debug():
    """Raise on NaN-producing ops within the context (debugging aid)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
