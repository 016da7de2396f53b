"""Tracing/profiling hooks (SURVEY.md §5 "Tracing/profiling").

The reference had only verbose wall-clock prints; the build exposes:
  * ``trace(dir)`` — a context manager capturing a jax.profiler trace
    (Perfetto-viewable) around any mapping region;
  * ``annotate(name)`` — named regions that show up in traces
    (jax.profiler.TraceAnnotation on device, no-op fallback);
  * per-batch structured stats live in pipeline.mapper.BatchStats and are
    emitted as JSONL by the CLI's ``-v`` (the roofline metric, DP
    cell-updates/sec, is ``dp_cells / device_s``).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    try:
        import jax
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()
