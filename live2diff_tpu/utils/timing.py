"""Timing + profiling instrumentation.

Replaces the reference's CUDA-event EMA timers and TensorRT IProfiler
(/root/reference/live2diff/pipeline_stream_animation_depth.py:626-659,
acceleration/tensorrt/engine.py:130-140) with host wall-clock timers around
block_until_ready'd device calls plus jax.profiler trace capture for
per-op analysis in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class EmaTimer:
    """Per-stage EMA + full history, matching the reference's protocol."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ema: Dict[str, float] = {}
        self.history: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def track(self, stage: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.add(stage, dt)

    def add(self, stage: str, dt: float) -> None:
        if stage in self.ema:
            self.ema[stage] = self.decay * self.ema[stage] + (1 - self.decay) * dt
        else:
            self.ema[stage] = dt
        self.history.setdefault(stage, []).append(dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for stage, times in self.history.items():
            arr = np.asarray(times[1:] or times)  # drop compile-tainted first sample
            out[stage] = {
                "ema_s": self.ema[stage],
                "mean_s": float(arr.mean()),
                "std_s": float(arr.std()),
                "count": len(times),
            }
        return out


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace capture (open in TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
