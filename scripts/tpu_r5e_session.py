"""Round-5 TPU session E: nearest-walk pack A/B + final ship confirm.

Usage: python scripts/tpu_run.py scripts/tpu_r5e_session.py [out.jsonl]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r5e.jsonl"
ISSUED = 1920 * 1080 * 5 * 4


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

    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import render_frame, resolve_mode

    scene, cam, cfg0 = mesh100k()
    cfg0 = resolve_mode(scene, cfg0.with_(
        use_bvh=True, kernel="mega", bvh_bins=64, stale_prune=False,
        occ_mode="pack"))
    packed = bvhmod.prepare_bvh(scene, cfg0)

    ref = None
    for name, kw in [
        ("ref_occpack", {}),
        ("nearpack", dict(near_mode="pack")),
        ("nearpack_u1", dict(near_mode="pack", walk_unroll=1)),
        ("nearpack_u3", dict(near_mode="pack", walk_unroll=3)),
    ]:
        try:
            cfg = cfg0.with_(**kw)
            c, t, img = timed(
                lambda: render_frame(scene, cam, cfg, bvh=packed))
            m = float(jnp.mean(img))
            if ref is None:
                ref = m
            emit(step="sweep", variant=name, compile_s=c, frame_s=t,
                 rays_per_s=ISSUED / t, img_probe=m,
                 probe_drift=abs(m - ref))
        except Exception as e:
            emit(step="sweep", variant=name, error=repr(e)[:400])

    best = None
    with open(OUT) as f:
        for line in f:
            r = json.loads(line)
            if (r.get("step") == "sweep" and r.get("frame_s")
                    and r.get("probe_drift", 1) < 1e-3):
                if best is None or r["frame_s"] < best["frame_s"]:
                    best = r
    emit(step="grad_pick", best=best and best["variant"])
    kw = {}
    if best and "nearpack" in best["variant"]:
        kw["near_mode"] = "pack"
    if best and "u1" in best["variant"]:
        kw["walk_unroll"] = 1
    if best and "u3" in best["variant"]:
        kw["walk_unroll"] = 3
    cfg = cfg0.with_(**kw)

    from unity_raytracer_tpu.fit import get_params
    from unity_raytracer_tpu.ops.replay import (
        live_depth, replay_value_and_grad, soft_replay_value_and_grad,
        trace_radiance_replay, trace_radiance_replay_soft, trace_records)
    from unity_raytracer_tpu.utils.config import DiffConfig

    names = ("sphere_centers", "sphere_diffuse", "light_intensities")
    params0 = get_params(scene, names)
    o, d = generate_rays_blocks(cam, cfg.block_size)
    target = jax.block_until_ready(jax.lax.stop_gradient(
        trace_radiance_replay(scene, o, d, cfg, packed))) * 0.9
    _, recs = trace_records(scene, o, d, cfg, packed)
    k = live_depth(recs)
    c, t, vg = timed(lambda: replay_value_and_grad(
        scene, params0, o, d, target, cfg, packed, live_segments=k),
        reps=2)
    emit(step="grad_replay", compile_s=c, grad_s=t,
         rays_per_s_fwd_bwd=ISSUED / t, loss=float(vg[0]))
    cfg_s = cfg.with_(diff=DiffConfig(1.0, 0.1, True))
    target_s = jax.block_until_ready(jax.lax.stop_gradient(
        trace_radiance_replay_soft(scene, o, d, cfg_s, packed,
                                   chunk=1 << 18))) * 0.9
    c, t, vg = timed(lambda: soft_replay_value_and_grad(
        scene, params0, o, d, target_s, cfg_s, packed,
        live_segments=k, chunk=1 << 18), reps=2)
    emit(step="grad_soft", compile_s=c, grad_s=t,
         rays_per_s_fwd_bwd=ISSUED / t, loss=float(vg[0]))
    emit(step="done")


if __name__ == "__main__":
    main()
