"""Real-time-factor benchmark harness.

Timing on the axon-tunneled backend must force a host transfer
(np.asarray) - block_until_ready returns before device work completes
there.  `measure` reports min/median over reps.
"""
from __future__ import annotations

import time
from typing import Callable, Dict

import numpy as np

from fpsc_tpu.dsp import constants as C


def measure(fn: Callable[[], object], reps: int = 5,
            warmup: int = 1) -> Dict[str, float]:
    for _ in range(warmup):
        np.asarray(fn())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"min_s": times[0], "median_s": times[len(times) // 2],
            "max_s": times[-1]}


def synthesis_rtf(batch: int, n_samples: int, wall_seconds: float,
                  sr: int = C.SAMPLE_RATE) -> float:
    """Aggregate real-time factor: audio-seconds produced per
    wall-second per chip."""
    return batch * n_samples / sr / wall_seconds
