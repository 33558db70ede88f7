"""Honest flagship frame timing: sync via a 4-byte scalar probe.

Previous harnesses did np.asarray(out)... on the full [1080,1920,3]
image, which drags 25MB through the ~30MB/s axon tunnel (~0.8s) and was
amortized into the reported per-rep mean. Here each rep syncs with
block_until_ready + a scalar element transfer only; reports min/mean.

Usage: python scripts/frame_timing.py [out.jsonl] [steps...]
steps: mega mk4 mk3 stats
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frame_timing.jsonl"
STEPS = sys.argv[2:] or ["mega", "mk4"]


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

    def timed(fn, reps=6):
        def sync(out):
            out = jax.block_until_ready(out)
            leaf = jax.tree.leaves(out)[0]
            # scalar probe: device-side slice, 4-byte transfer
            return float(leaf.ravel()[0])
        t0 = time.perf_counter()
        sync(fn())
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn())
            times.append(time.perf_counter() - t0)
        return compile_s, min(times), sum(times) / len(times)

    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import (
        render_frame, resolve_mode, trace_radiance_stats)

    scene, cam, cfg = mesh100k()
    cfg = resolve_mode(scene, cfg.with_(use_bvh=True))
    emit(step="init", devices=str(jax.devices()))

    ISSUED = 41472000  # pixels * segments * (1+lights), logical frame

    if "mega" in STEPS:
        cfgm = cfg.with_(kernel="mega")
        packedm = bvhmod.prepare_bvh(scene, cfgm)
        c, tmin, tmean = timed(
            lambda: render_frame(scene, cam, cfgm, bvh=packedm))
        emit(step="frame_mega", compile_s=c, min_s=tmin, mean_s=tmean,
             rays_per_s=ISSUED / tmin)

    if "mk4" in STEPS:
        packed = bvhmod.prepare_bvh(scene, cfg)
        c, tmin, tmean = timed(
            lambda: render_frame(scene, cam, cfg, bvh=packed))
        emit(step="frame_mk4", compile_s=c, min_s=tmin, mean_s=tmean,
             rays_per_s=ISSUED / tmin)

    if "mk3" in STEPS:
        packed = bvhmod.prepare_bvh(scene, cfg)
        cfg3 = cfg.with_(kernel="pallas3")
        c, tmin, tmean = timed(
            lambda: render_frame(scene, cam, cfg3, bvh=packed))
        emit(step="frame_mk3", compile_s=c, min_s=tmin, mean_s=tmean,
             rays_per_s=ISSUED / tmin)

    if "stats" in STEPS:
        packed = bvhmod.prepare_bvh(scene, cfg)
        o, d = generate_rays_blocks(cam, cfg.block_size)
        rad, (live, shadow) = jax.block_until_ready(
            trace_radiance_stats(scene, o, d, cfg, bvh=packed))
        emit(step="stats", live=[int(x) for x in np.asarray(live)],
             shadow=[int(x) for x in np.asarray(shadow)])

    emit(step="done")


if __name__ == "__main__":
    main()
