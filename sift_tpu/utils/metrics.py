"""Metrics, structured logging, and profiling hooks.

The reference has no observability at all (SURVEY.md §5); this provides the
mandated replacements:

* `MetricsLogger` — structured per-stage metrics as JSONL (keyframes/s,
  keypoints/frame, match inlier ratios, BA residuals, ATE), cheap enough to
  leave on in production;
* `stage(name)` — wall-clock timing context that also emits a
  `jax.profiler.TraceAnnotation`, so the same stage names show up in
  Perfetto/TensorBoard device traces;
* `profile_trace(dir)` — whole-program device trace capture around a block.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional, TextIO


class MetricsLogger:
    """Append-only JSONL metrics sink (stdout when path is None)."""

    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh: Optional[TextIO] = None
        if path is not None:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def log(self, event: str, **fields) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        line = json.dumps(rec, default=float)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo or self._fh is None:
            print(line)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@contextlib.contextmanager
def stage(name: str, logger: Optional[MetricsLogger] = None, **fields):
    """Time a pipeline stage; annotate device traces with the same name."""
    import jax.profiler

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    if logger is not None:
        logger.log("stage", name=name, wall_s=dt, **fields)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace (view in TensorBoard/Perfetto)."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
