"""Round-5 TPU session C: ship-candidate combos around the session-1
findings (bins64 tree -6%; stale-prune machinery costs more than it
saves; batch walks lose on cond count).

Variants are all EXACT (probe-checked against the session's own ref).

Usage: python scripts/tpu_run.py scripts/tpu_r5c_session.py \
           [out.jsonl] [steps...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r5c.jsonl"
STEPS = sys.argv[2:] or ["sweep", "grad"]

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
        x = jax.tree.leaves(out)[0]
        return float(jnp.ravel(x)[0])

    def timed(fn, *a, reps=3):
        t0 = time.perf_counter()
        out = fn(*a)
        probe(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        probe(out)
        return compile_s, (time.perf_counter() - t0) / reps, out

    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import render_frame, resolve_mode

    scene, cam, cfg0 = mesh100k()
    cfg0 = resolve_mode(scene, cfg0.with_(use_bvh=True, kernel="mega",
                                          bvh_bins=64))

    packs = {}

    def packed_for(leaf, bins=64, arity=4):
        key = (arity, leaf, bins)
        if key not in packs:
            t0 = time.perf_counter()
            packs[key] = bvhmod.prepare_bvh(
                scene, cfg0.with_(bvh_arity=arity, bvh_leaf=leaf,
                                  bvh_bins=bins))
            emit(step="bvh_build", arity=arity, leaf=leaf, bins=bins,
                 time_s=time.perf_counter() - t0)
        return packs[key]

    ref_probe = None

    def frame(name, cfg_kw=None, leaf=None, arity=4, reps=3):
        nonlocal ref_probe
        try:
            cfg = cfg0.with_(**(cfg_kw or {}))
            packed = packed_for(leaf or cfg.bvh_leaf, arity=arity)
            c, t, img = timed(
                lambda: render_frame(scene, cam, cfg, bvh=packed),
                reps=reps)
            m = float(jnp.mean(img))
            rec = dict(step="sweep", variant=name, compile_s=c,
                       frame_s=t, rays_per_s=ISSUED / t, img_probe=m)
            if ref_probe is None:
                ref_probe = m
            else:
                rec["probe_drift"] = abs(m - ref_probe)
            emit(**rec)
            return t
        except Exception as e:
            emit(step="sweep", variant=name, error=repr(e)[:400])
            return None

    if "sweep" in STEPS:
        frame("ref_bins64")
        frame("noprune", dict(stale_prune=False))
        frame("noprune_u1", dict(stale_prune=False, walk_unroll=1))
        frame("noprune_u3", dict(stale_prune=False, walk_unroll=3))
        frame("noprune_leaf84", dict(stale_prune=False, bvh_leaf=84),
              leaf=84)
        frame("noprune_leaf112", dict(stale_prune=False, bvh_leaf=112),
              leaf=112)
        frame("noprune_t1024", dict(stale_prune=False, tile_r=1024))
        frame("noprune_t4096", dict(stale_prune=False, tile_r=4096))
        frame("noprune_arity8", dict(stale_prune=False, bvh_arity=8),
              arity=8)
        frame("noprune_occnone", dict(stale_prune=False,
                                      occ_mode="none"))

    if "grad" in STEPS:
        # best exact config from this session's own log
        best = None
        with open(OUT) as f:
            for line in f:
                r = json.loads(line)
                if (r.get("step") == "sweep" and r.get("frame_s")
                        and r.get("probe_drift", 0.0) < 1e-3):
                    if best is None or r["frame_s"] < best["frame_s"]:
                        best = r
        emit(step="grad_pick", best=best and best["variant"])
        kw, leaf, arity = {}, cfg0.bvh_leaf, 4
        if best:
            v = best["variant"]
            if "noprune" in v:
                kw["stale_prune"] = False
            if "u1" in v:
                kw["walk_unroll"] = 1
            if "u3" in v:
                kw["walk_unroll"] = 3
            if "leaf84" in v:
                kw["bvh_leaf"] = leaf = 84
            if "leaf112" in v:
                kw["bvh_leaf"] = leaf = 112
            if "t1024" in v:
                kw["tile_r"] = 1024
            if "t4096" in v:
                kw["tile_r"] = 4096
            if "arity8" in v:
                kw["bvh_arity"] = arity = 8
            if "occnone" in v:
                kw["occ_mode"] = "none"
        cfg = cfg0.with_(**kw)
        packed = packed_for(leaf, arity=arity)
        emit(step="grad_config", **kw)

        from unity_raytracer_tpu.fit import get_params
        from unity_raytracer_tpu.ops.replay import (
            live_depth, replay_value_and_grad,
            soft_replay_value_and_grad, trace_radiance_replay,
            trace_radiance_replay_soft, trace_records)
        from unity_raytracer_tpu.utils.config import DiffConfig

        names = ("sphere_centers", "sphere_diffuse", "light_intensities")
        params0 = get_params(scene, names)
        o, d = generate_rays_blocks(cam, cfg.block_size)
        target = jax.block_until_ready(jax.lax.stop_gradient(
            trace_radiance_replay(scene, o, d, cfg, packed))) * 0.9
        _, recs = trace_records(scene, o, d, cfg, packed)
        k = live_depth(recs)
        c, t, vg = timed(lambda: replay_value_and_grad(
            scene, params0, o, d, target, cfg, packed,
            live_segments=k), reps=2)
        emit(step="grad_replay", compile_s=c, grad_s=t,
             rays_per_s_fwd_bwd=ISSUED / t, loss=float(vg[0]))

        cfg_s = cfg.with_(diff=DiffConfig(soft_shadow_temp=1.0,
                                          soft_hit_temp=0.1,
                                          straight_through=True))
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
