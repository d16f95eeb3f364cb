"""Profiling: first-class ``jax.profiler`` capture + per-step timing.

The reference only has ad-hoc wall-clock prints and an unused TensorBoard
dependency (SURVEY.md §5.1). Here: a trace context manager for the XLA
profiler (viewable in TensorBoard's profile plugin / xprof) and a
StepTimer that records per-step wall clock with p50/p90 summaries.
"""

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def profiler_trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace for the enclosed block."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with percentile summaries.

    Usage::

        timer = StepTimer()
        with timer.step():
            out = train_step(...)
            jax.block_until_ready(out)
        print(timer.summary())
    """

    def __init__(self, skip_first: int = 1):
        self.times: List[float] = []
        self.skip_first = skip_first
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.skip_first:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": int(arr.size),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "mean_s": float(arr.mean()),
            "min_s": float(arr.min()),
        }


def estimate_unet_flops(
    batch: int, latent_h: int, latent_w: int, params: Optional[int] = None
) -> float:
    """Rough FLOPs-per-step estimate for roofline/MXU-utilization reporting:
    ~3x forward cost for fwd+bwd, forward ~= 2 * params * tokens-equivalent.
    Use jax.stages.Compiled.cost_analysis() for exact counts when available.
    """
    params = params or 860_000_000  # SD1.5 UNet
    spatial = latent_h * latent_w
    return 3.0 * 2.0 * params * batch * (spatial / 4096.0)
