"""Round-5 TPU session G: cornell fused-fork knob sweep after the
tile-parent scatter fix (32.7ms/120M at t2048/cap2 in r5f; target
>=150M = <=26.2ms), plus the flagship ship-confirm at the r5 config.

Variants: tile 1024 (transient remote-compile error in r5f), and
tree_cap=1 at both tiles — cornell's live fork tiles may fit a
1x budget; the truncation counter + probe drift decide losslessness.

Usage: python scripts/tpu_run.py scripts/tpu_r5g_session.py \
           [out.jsonl] [steps...]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r5g.jsonl"
STEPS = sys.argv[2:] or ["cornell", "ship"]


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

    def probe(out):
        return float(jnp.ravel(jax.tree.leaves(out)[0])[0])

    def timed(fn, reps=3):
        t0 = time.perf_counter()
        out = fn()
        probe(out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        probe(out)
        return c, (time.perf_counter() - t0) / reps, out

    from unity_raytracer_tpu.models.presets import cornell_box, mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import render_frame, resolve_mode

    if "cornell" in STEPS:
        scene, cam, cfg = cornell_box()
        cfg = resolve_mode(scene, cfg)
        issued = 512 * 512 * 5 * 3
        ref_mean = None
        for variant, kw in [
            ("composed_ref", dict()),
            ("fused_t2048_cap2", dict(kernel="mega", tile_r=2048)),
            ("fused_t1024_cap2", dict(kernel="mega", tile_r=1024)),
            ("fused_t2048_cap1", dict(kernel="mega", tile_r=2048,
                                      tree_cap=1)),
            ("fused_t1024_cap1", dict(kernel="mega", tile_r=1024,
                                      tree_cap=1)),
        ]:
            try:
                cfg_v = cfg.with_(**kw) if kw else cfg
                c, t, img = timed(lambda: render_frame(scene, cam, cfg_v))
                m = float(jnp.mean(img))
                if ref_mean is None:
                    ref_mean = m
                emit(step="cornell", variant=variant, compile_s=c,
                     frame_s=t, rays_per_s=issued / t, img_probe=m,
                     probe_drift=abs(m - ref_mean))
            except Exception as e:
                emit(step="cornell", variant=variant,
                     error=repr(e)[:300])

    if "ship" in STEPS:
        scene, cam, cfg = mesh100k()
        cfg = resolve_mode(scene, cfg.with_(use_bvh=True, kernel="mega"))
        t0 = time.time()
        packed = bvhmod.prepare_bvh(scene, cfg)
        emit(step="bvh_build", time_s=time.time() - t0,
             bins=cfg.bvh_bins, leaf=cfg.bvh_leaf)
        issued = 1920 * 1080 * 5 * 4
        c, t, img = timed(lambda: render_frame(scene, cam, cfg,
                                               bvh=packed))
        emit(step="ship_fwd", compile_s=c, frame_s=t,
             rays_per_s=issued / t, img_probe=float(jnp.mean(img)))

    emit(step="done")


if __name__ == "__main__":
    main()
