"""Round-2 TPU measurement session (one chip claim, JSONL output).

Steps (default all):
  roofline  — VPU f32 FMA peak + HBM copy bandwidth microbenchmarks
  frame4    — mesh100k 1080p frame, swizzle+compact, mk4 kernel (default)
  frame3    — same frame with kernel='pallas3' (mk3 threaded order)
  trav      — traversal-only launches: primary nearest + shadow any_hit
  stats     — live-lane counts per segment (not timed)

Usage: python scripts/tpu_r2_session.py [out.jsonl] [steps...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r2.jsonl"
STEPS = sys.argv[2:] or ["roofline", "frame4", "frame3", "trav", "stats"]


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

    def timed(fn, *a, reps=4):
        """Tunnel-safe timing: block_until_ready does not sync small jobs
        on the axon backend (measured), so enqueue ``reps`` calls
        back-to-back, sync once at the end, and report mean per call —
        this also amortizes the ~20-30ms tunnel sync overhead."""
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        mean = (time.perf_counter() - t0) / reps
        return compile_s, mean, out

    if "roofline" in STEPS:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        K = 1024  # FMAs per element per pass

        def fma_kernel(x_ref, o_ref):
            v = x_ref[:]
            acc = v
            for _ in range(K):
                acc = acc * 1.000000119 + v
            o_ref[:] = acc

        ROWS, COLS, GRID = 512, 1024, 256
        x = jnp.ones((ROWS * GRID, COLS), jnp.float32)

        @jax.jit
        def fma(x):
            return pl.pallas_call(
                fma_kernel,
                grid=(GRID,),
                in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x)

        c, t, _ = timed(fma, x)
        flops = 2.0 * K * ROWS * COLS * GRID
        emit(step="vpu_fma", compile_s=c, time_s=t,
             tflops=flops / t / 1e12)

    need_scene = any(s in STEPS for s in ("frame4", "frame3", "framem",
                                          "trav", "stats"))
    if need_scene:
        from unity_raytracer_tpu.models.camera import generate_rays_blocks
        from unity_raytracer_tpu.models.presets import mesh100k
        from unity_raytracer_tpu.ops import bvh as bvhmod
        from unity_raytracer_tpu.ops.render import (
            render_frame, resolve_mode, trace_radiance_stats)

        scene, cam, cfg = mesh100k()
        cfg = resolve_mode(scene, cfg.with_(use_bvh=True))
        t0 = time.perf_counter()
        packed = bvhmod.prepare_bvh(scene, cfg)
        emit(step="bvh_build", time_s=time.perf_counter() - t0,
             nodes=int(packed.bvh.n_nodes))

    if "framem" in STEPS:
        cfgm = cfg.with_(kernel="mega")
        packedm = bvhmod.prepare_bvh(scene, cfgm)
        c, t, img = timed(lambda: render_frame(scene, cam, cfgm,
                                               bvh=packedm))
        emit(step="frame_mega", compile_s=c, time_s=t,
             rays_per_s=41472000 / t, mean=float(img.mean()))

    if "frame4" in STEPS:
        c, t, img = timed(lambda: render_frame(scene, cam, cfg, bvh=packed))
        emit(step="frame_mk4_swz", compile_s=c, time_s=t,
             rays_per_s=41472000 / t, mean=float(img.mean()))

    if "frame3" in STEPS:
        cfg3 = cfg.with_(kernel="pallas3")
        c, t, img = timed(lambda: render_frame(scene, cam, cfg3,
                                               bvh=packed))
        emit(step="frame_mk3_swz", compile_s=c, time_s=t,
             rays_per_s=41472000 / t, mean=float(img.mean()))

    if "trav" in STEPS:
        from unity_raytracer_tpu.ops.pallas.traverse_mk3 import (
            traverse_packet3)
        from unity_raytracer_tpu.ops.pallas.traverse_mk4 import (
            traverse_packet4)

        o, d = generate_rays_blocks(cam, cfg.block_size)

        f4 = jax.jit(lambda o, d: traverse_packet4(packed, o, d))
        c, t, (t4, i4, _) = timed(f4, o, d)
        emit(step="trav4_primary", compile_s=c, time_s=t,
             mrays_per_s=o.shape[0] / t / 1e6)

        f3 = jax.jit(lambda o, d: traverse_packet3(packed, o, d))
        c, t, (t3, i3, _) = timed(f3, o, d)
        emit(step="trav3_primary", compile_s=c, time_s=t,
             mrays_per_s=o.shape[0] / t / 1e6,
             match=float(jnp.mean((i3 == i4).astype(jnp.float32))))

        # shadow any_hit toward light 0 from first-hit points
        tt = np.asarray(t4)
        hitm = np.isfinite(tt)
        p = np.asarray(o) + np.asarray(d) * np.where(hitm, tt, 1.0)[:, None]
        lpos = np.asarray(scene.lights.positions)[0]
        lvec = lpos[None] - p
        ldist = np.linalg.norm(lvec, axis=-1)
        ldir = (lvec / ldist[:, None]).astype(np.float32)
        so = jnp.asarray(p + 1e-4 * ldir)
        sd = jnp.asarray(ldir)
        stm = jnp.asarray(np.where(hitm, ldist, -1.0).astype(np.float32))

        fs = jax.jit(lambda o, d, tm: traverse_packet4(packed, o, d,
                                                       t_max=tm,
                                                       any_hit=True))
        c, t, _ = timed(fs, so, sd, stm)
        emit(step="trav4_shadow_anyhit", compile_s=c, time_s=t,
             mrays_per_s=o.shape[0] / t / 1e6)

    if "stats" in STEPS:
        o, d = generate_rays_blocks(cam, cfg.block_size)
        rad, (live, shadow) = jax.block_until_ready(
            trace_radiance_stats(scene, o, d, cfg, bvh=packed))
        emit(step="stats", live=[int(x) for x in np.asarray(live)],
             shadow=[int(x) for x in np.asarray(shadow)])

    emit(step="done")


if __name__ == "__main__":
    main()
