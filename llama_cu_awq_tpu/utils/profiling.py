"""Profiling hooks (SURVEY.md §5 tracing/profiling row).

The reference's tracing is wall-clock tok/s plus optional per-token CUDA
events (llama2_q4.cu:32,347-394). The TPU-native equivalents:

- `profile_trace(dir)`: context manager around any engine call; writes
  an XPlane/Perfetto trace viewable in XProf/TensorBoard
  (`jax.profiler.trace`).
- `jax.profiler.start_server(port)` for live capture is available
  directly; nothing to wrap.
- Honest timing fences: engines already `block_until_ready`/device_get
  at their measurement boundaries.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def profile_trace(log_dir: str):
    """Capture a device+host profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
