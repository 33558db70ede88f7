"""Debug render modes: normal / depth / hit-id / shadow-mask maps.

The spirit of the reference's gizmo toggles (RayTracingSetup.cs:25-36 —
DrawPixelRays, DrawIntersections, DrawSurfaceNormals, ...) returns here as
cheap aux images: in a wavefront design these are just the primary-hit
intermediates rendered to tensors.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from unity_raytracer_tpu.models.camera import Camera, generate_rays
from unity_raytracer_tpu.models.scene import Scene
from unity_raytracer_tpu.ops import shade as sh
from unity_raytracer_tpu.ops.intersect import nearest_hit


def debug_maps(scene: Scene, cam: Camera, bvh=None) -> Dict[str, jnp.ndarray]:
    """Primary-hit diagnostics, each [H,W,...] on a 0-1-ish display scale.

    * ``normal``  — shading normal visualized as 0.5*(n+1)
    * ``depth``   — hit distance, normalized by its finite max
    * ``hit_kind``— category code / 3 (0 bg, mesh 1/3, sphere 2/3, tri 1)
    * ``hit_id``  — primitive index hashed to a color
    * ``shadow``  — fraction of (valid) lights visible from the hit point
    """
    h, w = cam.height, cam.width
    o, d = generate_rays(cam)
    hit = nearest_hit(scene, o, d, bvh=bvh)
    hm = hit.is_hit
    t_safe = jnp.where(hm, hit.t, 0.0)
    p = o + d * t_safe[:, None]
    n, mats = sh.surface_attributes(scene, p, hit)

    normal = jnp.where(hm[:, None], 0.5 * (n + 1.0), 0.0)

    finite = jnp.where(hm, hit.t, 0.0)
    tmax = jnp.maximum(jnp.max(finite), 1e-6)
    depth = jnp.where(hm, hit.t / tmax, 1.0)

    kind = hit.kind.astype(jnp.float32) / 3.0

    idx = hit.index.astype(jnp.uint32)
    hashed = (idx * jnp.uint32(2654435761)) % jnp.uint32(2**24)
    rgb = jnp.stack([(hashed >> 16) & 0xFF, (hashed >> 8) & 0xFF,
                     hashed & 0xFF], axis=-1).astype(jnp.float32) / 255.0
    hit_id = jnp.where(hm[:, None], rgb, 0.0)

    # shadow mask: visible-light fraction at the primary hit
    L = scene.lights.positions.shape[0]
    lvec = scene.lights.positions[None, :, :] - p[:, None, :]
    ldist_sq = jnp.sum(lvec * lvec, axis=-1)
    ldir = lvec / jnp.sqrt(ldist_sq)[..., None]
    so = p + n * sh.SHADOW_EPS
    N = p.shape[0]
    st = sh.shadow_min_t(
        scene, jnp.broadcast_to(so[:, None, :], (N, L, 3)).reshape(-1, 3),
        ldir.reshape(-1, 3), bvh=bvh,
        t_max=jnp.sqrt(ldist_sq).reshape(-1)).reshape(N, L)
    visible = ((st * st) >= ldist_sq).astype(jnp.float32)
    lv = scene.lights.valid.astype(jnp.float32)[None, :]
    frac = jnp.sum(visible * lv, axis=1) / jnp.maximum(jnp.sum(lv), 1.0)
    shadow = jnp.where(hm, frac, 0.0)

    return {
        "normal": normal.reshape(h, w, 3),
        "depth": depth.reshape(h, w),
        "hit_kind": kind.reshape(h, w),
        "hit_id": hit_id.reshape(h, w, 3),
        "shadow": shadow.reshape(h, w),
    }
