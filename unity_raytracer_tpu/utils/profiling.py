"""Profiling + throughput accounting.

The reference has zero instrumentation (no Profiler markers, no timers —
SURVEY.md §5.1; only gizmo drawing). Here:

* `timed` — block_until_ready-bracketed wall clock;
* `trace` — context manager around ``jax.profiler.trace`` (XProf/
  TensorBoard dumps);
* `roofline` — rays/s vs HBM-bandwidth bound estimate, substantiating the
  per-chip speed-of-light claim.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax


@dataclass
class Timing:
    wall_s: float
    runs: int

    @property
    def per_run_s(self) -> float:
        return self.wall_s / max(self.runs, 1)


def timed(fn: Callable, *args, repeats: int = 3, warmup: int = 1,
          **kw) -> Timing:
    """Best-of-N wall clock with device sync; warmup runs compile."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return Timing(wall_s=best, runs=1)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope: view with TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Known per-chip HBM bandwidths (GB/s), for roofline context only.
_HBM_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5 lite": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}


def device_hbm_gbps(default: float = 819.0) -> float:
    name = str(jax.devices()[0]).lower()
    for k, v in _HBM_GBPS.items():
        if k in name:
            return v
    return default


def roofline(rays_per_s: float, bytes_per_ray: float) -> dict:
    """How close is measured throughput to the HBM-bandwidth bound?

    ``bytes_per_ray``: estimated HBM traffic per traced ray (scene reads
    amortize across the batch; the dominant term is per-ray state + node/
    triangle gathers for BVH traversal).
    """
    bw = device_hbm_gbps() * 1e9
    bound = bw / max(bytes_per_ray, 1e-9)
    return {
        "rays_per_s": rays_per_s,
        "hbm_gbps": bw / 1e9,
        "bytes_per_ray": bytes_per_ray,
        "hbm_bound_rays_per_s": bound,
        "fraction_of_roofline": rays_per_s / bound,
    }
