"""Profiling and compilation-cache helpers.

The reference keeps observability to a per-step callback hook and external
scripts; here the same hook exists on the scan loop (via ``jax.debug``)
plus first-class profiler/cache utilities for production use."""

from __future__ import annotations

import contextlib
from pathlib import Path


def enable_compilation_cache(path: str | Path = "~/.cache/skrample_tpu_xla") -> None:
    """Persist compiled executables across processes.

    Long scan loops and sharded model steps compile once per
    (shape, step-count) — caching them makes warm starts near-instant."""
    import jax

    path = str(Path(path).expanduser())
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/skrample_tpu_trace"):
    """Profile a region into a TensorBoard-compatible trace:

        with trace("/tmp/tb"):
            pipe.generate(key).block_until_ready()
    """
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
