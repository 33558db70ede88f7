"""Decompose the flagship megakernel frame (TPU, one chip claim).

The wide4/bin A/B landed within 0.5% at ~0.202s/frame — the frame is NOT
traversal-step-bound. This probe times the pieces to find what is:

  seg0_*   — ONE fused segment (all lanes live, primary rays)
  dead_*   — ONE fused segment with every lane culled (tmax=-1): the
             cost the scan pays per post-retirement segment
  trav_*   — ONE standalone nearest-hit traversal launch (no shading)
  shad_*   — ONE standalone any-hit launch (t_max=10)
  raygen   — block raygen alone

Usage: python scripts/seg_probe.py [out.jsonl]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/seg_probe.jsonl"


def emit(**rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec, default=float) + "\n")
    print(json.dumps(rec, default=float), flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def timed(fn, reps=5):
        def sync(out):
            out = jax.block_until_ready(out)
            return float(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        sync(fn())
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn())
            times.append(time.perf_counter() - t0)
        return compile_s, min(times)

    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import resolve_mode
    from unity_raytracer_tpu.ops.pallas import mega as megamod
    from unity_raytracer_tpu.ops.pallas.traverse_mk4 import traverse_packet4
    from unity_raytracer_tpu.ops.pallas.traverse_wide import (
        traverse_wide, widen)

    scene, cam, cfg = mesh100k()
    cfg = resolve_mode(scene, cfg.with_(use_bvh=True, kernel="mega"))
    emit(step="init", devices=str(jax.devices()))

    packed4 = bvhmod.prepare_bvh(scene, cfg)
    packed8 = widen(packed4, arity=8)

    c, t = timed(jax.jit(lambda: generate_rays_blocks(cam, cfg.block_size)))
    emit(step="raygen", compile_s=c, min_s=t)
    o, d = jax.block_until_ready(
        jax.jit(lambda: generate_rays_blocks(cam, cfg.block_size))())
    n = o.shape[0]
    emit(step="rays", n=n)

    aux = megamod.build_aux(scene, cfg.background)
    kw = dict(n_lights=scene.lights.positions.shape[0],
              n_spheres=scene.spheres.count,
              n_tris=scene.triangles.count,
              max_bounces=cfg.max_bounces, tile_r=cfg.tile_r)
    thr = jnp.ones((n, 3), jnp.float32)
    live = jnp.full((n,), 3.0e38, jnp.float32)
    dead = jnp.full((n,), -1.0, jnp.float32)
    depth = jnp.int32(0)

    def seg(pk, use_wide, fuse, tmax):
        f = jax.jit(functools.partial(
            megamod.trace_segment, use_wide=use_wide, fuse_shadows=fuse,
            **kw))
        return timed(lambda: f(pk, aux, depth, o, d, thr, tmax))

    for name, pk, w, fu in [("bin", packed4, False, False),
                            ("wide4", packed4, True, True),
                            ("wide4nf", packed4, True, False),
                            ("wide8", packed8, True, True)]:
        try:
            c, t = seg(pk, w, fu, live)
            emit(step=f"seg0_{name}", compile_s=c, min_s=t)
        except Exception as e:
            emit(step=f"seg0_{name}", error=repr(e)[:400])
    for name, pk, w in [("bin", packed4, False), ("wide4", packed4, True)]:
        try:
            c, t = seg(pk, w, True, dead)
            emit(step=f"dead_{name}", compile_s=c, min_s=t)
        except Exception as e:
            emit(step=f"dead_{name}", error=repr(e)[:400])

    def trav(fn, pk, any_hit, tmax):
        f = jax.jit(functools.partial(fn, any_hit=any_hit))
        return timed(lambda: f(pk, o, d, t_max=tmax))

    tm10 = jnp.full((n,), 10.0, jnp.float32)
    for name, fn, pk in [("bin", traverse_packet4, packed4),
                         ("wide4", traverse_wide, packed4),
                         ("wide8", traverse_wide, packed8)]:
        try:
            c, t = trav(fn, pk, False, None)
            emit(step=f"trav_{name}", compile_s=c, min_s=t)
            c, t = trav(fn, pk, True, tm10)
            emit(step=f"shad_{name}", compile_s=c, min_s=t)
        except Exception as e:
            emit(step=f"trav_{name}", error=repr(e)[:400])
    emit(step="done")


if __name__ == "__main__":
    main()
