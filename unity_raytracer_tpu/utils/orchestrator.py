"""Tile-granular render orchestration with failure retry (SURVEY.md §5.3).

Render jobs are stateless and idempotent, so recovery is re-dispatch: the
orchestrator tracks per-tile completion and retries failed tiles. On a pod
this is the host-failure story (re-dispatch missing tiles elsewhere); on one
chip it also bounds peak memory like RenderConfig.ray_chunk but with
restartable progress (checkpointable tile bitmap).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from unity_raytracer_tpu.models.camera import Camera, generate_rays
from unity_raytracer_tpu.models.scene import Scene
from unity_raytracer_tpu.ops.render import resolve_mode, trace_radiance
from unity_raytracer_tpu.utils.config import RenderConfig


@dataclass
class TileReport:
    tile: int
    rows: Tuple[int, int]
    attempts: int
    seconds: float
    ok: bool


def render_tiled_orchestrated(
        scene: Scene, cam: Camera, cfg: RenderConfig, bvh=None,
        rows_per_tile: int = 128, max_retries: int = 2,
        trace_fn: Optional[Callable] = None,
        progress: Optional[Callable[[TileReport], None]] = None
) -> Tuple[np.ndarray, List[TileReport]]:
    """Render row-bands independently; retry failed bands.

    ``trace_fn(scene, o, d, cfg, bvh)`` is injectable for tests (fault
    injection). Returns (image [H,W,3] display scale, reports). A band that
    exhausts retries leaves zeros and reports ok=False.
    """
    cfg = resolve_mode(scene, cfg)
    trace = trace_fn or (lambda s, o, d, c, b: trace_radiance(s, o, d, c,
                                                              bvh=b))
    h, w = cam.height, cam.width
    # jit so raygen arithmetic compiles (FMA contraction) exactly like the
    # whole-frame path — eager op-by-op raygen drifts ~3e-6 vs render()
    o, d = jax.jit(generate_rays)(cam)
    o = o.reshape(h, w, 3)
    d = d.reshape(h, w, 3)

    img = np.zeros((h, w, 3), np.float32)
    reports: List[TileReport] = []
    n_tiles = (h + rows_per_tile - 1) // rows_per_tile

    for tile in range(n_tiles):
        r0 = tile * rows_per_tile
        r1 = min(r0 + rows_per_tile, h)
        ot = o[r0:r1].reshape(-1, 3)
        dt = d[r0:r1].reshape(-1, 3)
        ok = False
        attempts = 0
        t0 = time.perf_counter()
        while attempts <= max_retries and not ok:
            attempts += 1
            try:
                rad = trace(scene, ot, dt, cfg, bvh)
                img[r0:r1] = np.asarray(rad).reshape(r1 - r0, w, 3) / 255.0
                ok = True
            except Exception:
                if attempts > max_retries:
                    break
        rep = TileReport(tile=tile, rows=(r0, r1), attempts=attempts,
                         seconds=time.perf_counter() - t0, ok=ok)
        reports.append(rep)
        if progress:
            progress(rep)
    return img, reports
