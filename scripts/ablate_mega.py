"""Ablate the megakernel frame: pipeline vs segment-launch costs.

Usage: python scripts/ablate_mega.py [out.jsonl]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ablate_mega.jsonl"


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
    from unity_raytracer_tpu.ops.render import render_frame, resolve_mode
    from unity_raytracer_tpu.ops.pallas.mega import build_aux, trace_segment
    from unity_raytracer_tpu.utils.swizzle import unswizzle_image

    scene, cam, cfg = mesh100k()
    cfg = resolve_mode(scene, cfg.with_(use_bvh=True, kernel="mega"))
    packed = bvhmod.prepare_bvh(scene, cfg)
    emit(step="init", devices=str(jax.devices()))

    c, t = timed(lambda: render_frame(scene, cam, cfg, bvh=packed))
    emit(step="frame_mega", compile_s=c, time_s=t)

    # pipeline alone (SoA raygen + per-channel unswizzle)
    @jax.jit
    def pipe_only():
        o, d = generate_rays_blocks(cam, cfg.block_size)
        rad = jnp.abs(d) * 255.0
        return unswizzle_image(rad, cam.width, cam.height,
                               cfg.block_size) / 255.0
    c, t = timed(pipe_only)
    emit(step="pipe_only", compile_s=c, time_s=t)

    # raygen only
    @jax.jit
    def raygen_only():
        o, d = generate_rays_blocks(cam, cfg.block_size)
        return d
    c, t = timed(raygen_only)
    emit(step="raygen_only", compile_s=c, time_s=t)

    # one fused segment, all lanes live (seg0 shape)
    o, d = generate_rays_blocks(cam, cfg.block_size)
    n = o.shape[0]
    aux = build_aux(scene, cfg.background)
    thr = jnp.ones((n, 3), jnp.float32)
    tmax = jnp.full((n,), 3.0e38, jnp.float32)
    kw = dict(n_lights=scene.lights.positions.shape[0],
              n_spheres=scene.spheres.count,
              n_tris=scene.triangles.count, max_bounces=cfg.max_bounces)

    f = jax.jit(lambda o, d, thr, tmax: trace_segment(
        packed, aux, jnp.int32(0), o, d, thr, tmax, **kw))
    c, t = timed(f, o, d, thr, tmax)
    emit(step="seg0_live", compile_s=c, time_s=t)

    dead = jnp.full((n,), -1.0, jnp.float32)
    c, t = timed(f, o, d, thr, dead)
    emit(step="seg_all_dead", compile_s=c, time_s=t)

    emit(step="done")


if __name__ == "__main__":
    main()
