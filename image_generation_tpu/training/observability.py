"""Tracing and metrics: the framework's observability layer.

The reference's only instrumentation is a wall-clock print per epoch
(src/utils/callback_helpers.py:173, 186-191).  Here:

  * ``profile`` — context manager around ``jax.profiler.trace``: writes a
    TensorBoard/Perfetto-compatible trace of the device timeline (set
    ``IMGGEN_PROFILE_DIR`` or pass ``--profile`` in the CLI);
  * ``MetricsLog`` — append-only JSONL of per-epoch metrics (mse, total
    loss, epoch wall time, images/sec) for offline analysis, next to the
    UI's figure-JSON protocol (app/files.py).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from pathlib import Path
from typing import Optional

__all__ = ["profile", "MetricsLog"]


@contextlib.contextmanager
def profile(log_dir: Optional[str] = None):
    """Trace device execution if a profile dir is configured; no-op otherwise."""
    log_dir = log_dir or os.environ.get("IMGGEN_PROFILE_DIR")
    if not log_dir:
        yield None
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield log_dir


class MetricsLog:
    """Append-only JSONL metrics stream (one record per epoch/event)."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._t0 = time.perf_counter()

    def log(self, event: str, **fields) -> dict:
        rec = {"event": event, "t": round(time.perf_counter() - self._t0, 3), **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    def read(self) -> list:
        if not self.path.exists():
            return []
        return [json.loads(line) for line in self.path.read_text().splitlines() if line]
