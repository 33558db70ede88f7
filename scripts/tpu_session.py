"""One-shot TPU measurement session: run everything in a single process.

The tunnelled chip admits one claim at a time with a multi-minute cooldown
between sessions, so piecemeal probing wastes 10+ minutes per step. This
script runs the full measurement ladder inside one claim, flushing JSONL
results after every step so a mid-session fault still leaves data.

Usage: python scripts/tpu_session.py [out.jsonl] [steps...]
Steps default: trav_small pallas_small mesh10k mesh100k
"""

import json
import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session.jsonl"
STEPS = sys.argv[2:] or ["trav_small", "pallas_small", "mesh10k", "mesh100k"]


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

    emit(step="init", devices=str(jax.devices()))

    from unity_raytracer_tpu.models import meshgen
    from unity_raytracer_tpu.models.camera import generate_rays
    from unity_raytracer_tpu.models.presets import mesh_scene
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import resolve_mode, trace_radiance

    rng = np.random.default_rng(0)

    def timed(fn, *a):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return compile_s, best, out

    # shared small BVH
    v, f = meshgen.icosphere(subdivisions=3, radius=2.0)
    small_bvh = bvhmod.build(v[f])
    n = 8192
    o = jnp.asarray(rng.normal(size=(n, 3)) * 3, jnp.float32)
    d0 = rng.normal(size=(n, 3))
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d = jnp.asarray(d0, jnp.float32)

    if "trav_small" in STEPS:
        try:
            fn = jax.jit(lambda o, d: bvhmod.traverse(small_bvh, o, d))
            c, b, out = timed(fn, o, d)
            hits = int(np.isfinite(np.asarray(out[0])).sum())
            emit(step="trav_small_xla", compile_s=c, best_s=b, hits=hits,
                 rays=n)
        except Exception as e:
            emit(step="trav_small_xla", error=str(e)[:300])
            return  # device likely faulted; stop

    if "pallas_small" in STEPS:
        try:
            from unity_raytracer_tpu.ops.pallas.traverse_mk import (
                traverse_packet)
            fn = jax.jit(lambda o, d: traverse_packet(small_bvh, o, d))
            c, b, out = timed(fn, o, d)
            hits = int(np.isfinite(np.asarray(out[0])).sum())
            emit(step="trav_small_pallas", compile_s=c, best_s=b, hits=hits,
                 rays=n)
            # cross-check vs xla result on this backend
            t_x, i_x = jax.jit(
                lambda o, d: bvhmod.traverse(small_bvh, o, d))(o, d)
            agree = float((np.asarray(out[1]) == np.asarray(i_x)).mean())
            emit(step="trav_agree", idx_agree=agree)
        except Exception as e:
            emit(step="trav_small_pallas", error=str(e)[:300])

    if "pallas_brute" in STEPS:
        try:
            from unity_raytracer_tpu.ops.pallas.intersect_mk import (
                nearest_triangle_pallas)
            verts = jnp.asarray(v[f])
            fn = jax.jit(lambda o, d: nearest_triangle_pallas(o, d, verts))
            c, b, out = timed(fn, o, d)
            emit(step="pallas_brute_small", compile_s=c, best_s=b)
        except Exception as e:
            emit(step="pallas_brute_small", error=str(e)[:300])

    def bench_preset(tag, n_tris, width, height, kernel):
        scene, cam, cfg = mesh_scene(n_tris, width=width, height=height)
        cfg = resolve_mode(scene, cfg.with_(kernel=kernel))
        bvh = bvhmod.build(np.asarray(scene.meshes.verts),
                           np.asarray(scene.meshes.valid))
        o_, d_ = generate_rays(cam)
        fn = jax.jit(lambda o, d: trace_radiance(scene, o, d, cfg, bvh=bvh))
        c, b, out = timed(fn, o_, d_)
        n_lights = int(np.asarray(scene.lights.valid).sum())
        rays = width * height * (cfg.max_bounces + 1) * (1 + n_lights)
        emit(step=tag, compile_s=c, best_s=b, rays=rays,
             rays_per_s=rays / b, kernel=kernel,
             mean_radiance=float(np.asarray(out).mean()))

    if "mesh10k" in STEPS:
        try:
            bench_preset("mesh10k_pallas", 10240, 1024, 1024, "pallas")
        except Exception as e:
            emit(step="mesh10k_pallas", error=str(e)[:300])
            return

    if "mesh100k" in STEPS:
        try:
            bench_preset("mesh100k_pallas", 102400, 1920, 1080, "pallas")
        except Exception as e:
            emit(step="mesh100k_pallas", error=str(e)[:300])

    emit(step="done")


if __name__ == "__main__":
    main()
