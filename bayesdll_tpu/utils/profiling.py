"""Tracing / profiling subsystem.

The reference's only observability is coarse per-epoch wall clock
(reference `methods/sgld.py:88,104-113`; SURVEY.md §5.1).  Here:

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable device trace (op-level timeline, HBM usage).
  * `StepTimer` — cheap online step-time stats (mean/p50/p95) with proper
    `block_until_ready` fencing, for steps/sec telemetry without a trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


# --- hardware/model constants shared by bench.py and tools/ benches --------

V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s per chip

# Analytic forward FLOPs per example at 224^2 (XLA's TPU cost_analysis
# under-reports flops for scanned/fused programs, so MFU uses these):
# convs/matmuls only, 2 FLOPs per MAC; training step = 3x forward.
FWD_FLOPS_PER_EXAMPLE = {
    "resnet101": 15.7e9,       # 7.85 GMACs (torchvision profile)
    "resnet50": 8.2e9,         # 4.09 GMACs
    "vit_l_32": 30.5e9,        # 2 * 305M params * 50 tokens
    "vit_b_16": 33.8e9,        # 2 * 86M params * 197 tokens
}


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Device-level profiler trace; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.samples = []

    @contextlib.contextmanager
    def measure(self, result_to_fence=None):
        t0 = time.perf_counter()
        yield
        if result_to_fence is not None:
            jax.block_until_ready(result_to_fence)
        self.samples.append(time.perf_counter() - t0)

    def stats(self):
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {
            "steps": len(a),
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p95_s": float(np.percentile(a, 95)),
            "steps_per_sec": float(1.0 / a.mean()),
        }
