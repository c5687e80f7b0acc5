"""Profiling hooks: jax.profiler trace annotations + Perfetto dumps.

Usage:
    with profile_trace("/tmp/gvom-trace"):      # one-shot Perfetto/XPlane dump
        with annotate("ingest"):
            engine.process_pointcloud(...)
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["annotate", "profile_trace"]


def annotate(name: str):
    """Named region visible in the profiler timeline (no-op cost outside traces)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    try:
        options = jax.profiler.ProfileOptions()
        options.host_tracer_level = host_tracer_level
        kwargs = {"profiler_options": options}
    except AttributeError:  # older jax: no ProfileOptions
        kwargs = {}
    jax.profiler.start_trace(log_dir, **kwargs)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
