"""Ablate the flagship frame: where does the remaining ~1.0s go?

Each variant is its own jit so the ~40-85ms dispatch floor applies once
per timing, not per op. Subtraction between rows locates in-graph cost.

Usage: python scripts/ablate_frame.py [out.jsonl]
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ablate.jsonl"


def emit(**rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec, default=float) + "\n")
    print(json.dumps(rec, default=float), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def timed(fn, *a, reps=4):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        return compile_s, (time.perf_counter() - t0) / reps

    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops import shade as sh
    from unity_raytracer_tpu.ops.intersect import nearest_hit
    from unity_raytracer_tpu.ops.render import (
        _local_radiance, render_frame, resolve_mode, trace_radiance)
    from unity_raytracer_tpu.ops.pallas.traverse_mk4 import traverse_packet4
    from unity_raytracer_tpu.utils.swizzle import unswizzle_image

    scene, cam, cfg = mesh100k()
    cfg = resolve_mode(scene, cfg.with_(use_bvh=True))
    packed = bvhmod.prepare_bvh(scene, cfg)
    emit(step="init", devices=str(jax.devices()))

    # 0. full frame (reference)
    c, t = timed(lambda: render_frame(scene, cam, cfg, bvh=packed))
    emit(step="full_frame_d4", compile_s=c, time_s=t)

    # 1. raygen + trivial shade + unswizzle: image-pipeline floor
    @jax.jit
    def pipe_only():
        o, d = generate_rays_blocks(cam, cfg.block_size)
        rad = jnp.abs(d) * 255.0
        return unswizzle_image(rad, cam.width, cam.height,
                               cfg.block_size) / 255.0
    c, t = timed(pipe_only)
    emit(step="raygen_unswizzle_only", compile_s=c, time_s=t)

    # 2. one full segment (max_bounces=0)
    cfg0 = cfg.with_(max_bounces=0)
    c, t = timed(lambda: render_frame(scene, cam, cfg0, bvh=packed))
    emit(step="frame_d0", compile_s=c, time_s=t)

    # 3. one segment without shadow queries (lights invalidated)
    scene_nl = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights, valid=jnp.zeros_like(scene.lights.valid)))
    c, t = timed(lambda: render_frame(scene_nl, cam, cfg0, bvh=packed))
    emit(step="frame_d0_nolights", compile_s=c, time_s=t)

    # 4. nearest_hit only (5x via scan-like loop, no shading)
    o, d = generate_rays_blocks(cam, cfg.block_size)

    @jax.jit
    def nearest_only(o, d):
        hit = nearest_hit(scene, o, d, bvh=packed, kernel=cfg.kernel)
        return hit.t, hit.kind

    c, t = timed(nearest_only, o, d)
    emit(step="nearest_hit_1x", compile_s=c, time_s=t)

    # 5. raw mesh traversal 1x (same rays)
    f = jax.jit(lambda o, d: traverse_packet4(packed, o, d))
    c, t = timed(f, o, d)
    emit(step="trav4_1x", compile_s=c, time_s=t)

    # 6. shadow-scale traversal: L*N lanes light-major any-hit
    L = 3
    n = o.shape[0]
    hit_t = jnp.full((n,), 8.0, jnp.float32)
    p = o + d * hit_t[:, None]
    so = jnp.broadcast_to(p[None], (L, n, 3)).reshape(-1, 3)
    lpos = scene.lights.positions
    lvec = lpos[:, None, :] - p[None, :, :]
    ldist = jnp.sqrt(jnp.sum(lvec * lvec, -1))
    sd = (lvec / ldist[..., None]).reshape(-1, 3)
    stm = ldist.reshape(-1)
    f = jax.jit(lambda so, sd, stm: traverse_packet4(
        packed, so, sd, t_max=stm, any_hit=True))
    c, t = timed(f, so, sd, stm)
    emit(step="trav4_shadow_3N", compile_s=c, time_s=t,
         lanes=int(so.shape[0]))

    # 7. surface_attributes + direct_lighting math with mocked hit
    #    (shadow traversal replaced by the real one is in row 2-3 diffs)
    from unity_raytracer_tpu.ops.intersect import Hit, KIND_MESH
    hit = Hit(t=hit_t, kind=jnp.full((n,), KIND_MESH, jnp.int32),
              index=jnp.zeros((n,), jnp.int32),
              mesh_index=jnp.zeros((n,), jnp.int32))

    @jax.jit
    def attrs_only(o, d):
        pp = o + d * 8.0
        nrm, mats = sh.surface_attributes(scene, pp, hit)
        return nrm, mats.diffuse

    c, t = timed(attrs_only, o, d)
    emit(step="surface_attributes_1x", compile_s=c, time_s=t)

    emit(step="done")


if __name__ == "__main__":
    main()
