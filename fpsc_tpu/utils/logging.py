"""Structured metrics logging + profiling/NaN-debug helpers.

The reference's observability is print + append-only text files
(reference: src/utils.py:127-157); here structured JSONL metrics sit
next to the reference-format epoch lines, and jax.profiler / debug_nans
are exposed as one-liners (SURVEY section 5.1-5.2 aux subsystems).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str, enabled: bool = True):
        self.path = path
        self.enabled = enabled
        if enabled:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, step: int, **metrics):
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace around a block (view in
    TensorBoard/XProf).  No-op when log_dir is falsy."""
    import jax

    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True):
    """Fail fast on NaNs in any jitted computation (the framework
    analog of the dataset's NaN re-draw guard)."""
    import jax

    jax.config.update("jax_debug_nans", enable)
