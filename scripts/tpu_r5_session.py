"""Round-5 TPU measurement session (one chip claim, JSONL output).

Steps (default all):
  base      — shipped flagship config reference frame (leaf98/bw/u2/
              t2048/per-light walks)
  decomp    — step-overhead decomposition (VERDICT r5 ask #1b): dbg
              switches isolate nearest walk / shadow walks / leaf tests
              / the leaf lax.cond / sort network / stale-prune loop
  batch     — batched per-light shadow walks (cfg.shadow_batch: ONE
              while_loop, L independent stacks — overhead paid
              max(steps) instead of sum(steps) times) x unroll x tile
  trees     — tree-quality A/B (VERDICT r5 ask #1a): SAH bins 32/64,
              fatter leaves 140/196 (modeled first in roofline_r5.py)
  tailgather— threshold-compaction ingredient costs at the ACTUAL tail
              size (VERDICT r5 ask #2): cumsum+index build, C-row
              gather, C-row scatter-add at C = 128k/256k of 2M lanes
  combo     — best-of combination frame + record-replay fwd+bwd
  arity8    — arity-8 retry under the r5 step-overhead regime (bw fat
              leaves changed the economics that killed it in r3)

Usage: python scripts/tpu_run.py scripts/tpu_r5_session.py \
           [out.jsonl] [steps...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r5.jsonl"
STEPS = sys.argv[2:] or ["base", "decomp", "batch", "trees",
                         "tailgather", "combo"]

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
        mean = (time.perf_counter() - t0) / reps
        return compile_s, mean, out

    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import render_frame, resolve_mode

    scene, cam, cfg0 = mesh100k()
    cfg0 = resolve_mode(scene, cfg0.with_(use_bvh=True, kernel="mega"))

    packs = {}

    def packed_for(leaf=None, bins=16, arity=4):
        leaf = leaf or cfg0.bvh_leaf
        key = (arity, leaf, bins)
        if key not in packs:
            t0 = time.perf_counter()
            packs[key] = bvhmod.prepare_bvh(
                scene, cfg0.with_(bvh_arity=arity, bvh_leaf=leaf,
                                  bvh_bins=bins))
            emit(step="bvh_build", arity=arity, leaf=leaf, bins=bins,
                 time_s=time.perf_counter() - t0)
        return packs[key]

    def frame(name, step, cfg_kw=None, leaf=None, bins=16, arity=4,
              reps=3, ref_probe=None):
        try:
            cfg = cfg0.with_(**(cfg_kw or {}))
            packed = packed_for(leaf=leaf or cfg.bvh_leaf, bins=bins,
                                arity=arity)
            c, t, img = timed(
                lambda: render_frame(scene, cam, cfg, bvh=packed),
                reps=reps)
            m = float(jnp.mean(img))
            rec = dict(step=step, variant=name, compile_s=c, frame_s=t,
                       rays_per_s=ISSUED / t, img_probe=m)
            if ref_probe is not None:
                rec["probe_drift"] = abs(m - ref_probe)
            emit(**rec)
            return t, m
        except Exception as e:
            emit(step=step, variant=name, error=repr(e)[:400])
            return None, None

    ref_probe = None
    if "base" in STEPS:
        t, ref_probe = frame("ship_leaf98_bw", "base")

    # ---- decomp: step-overhead decomposition --------------------------
    if "decomp" in STEPS:
        for name in ("noshadow", "nonear", "noleaf", "leaf1",
                     "nosort", "noprune", "noshadow,nonear"):
            frame(f"dbg_{name}", "decomp", dict(dbg=name))

    # ---- batch: batched per-light walks -------------------------------
    if "batch" in STEPS:
        frame("batch_u2_t2048", "batch", dict(shadow_batch=True),
              ref_probe=ref_probe)
        frame("batch_u1", "batch",
              dict(shadow_batch=True, walk_unroll=1),
              ref_probe=ref_probe)
        frame("batch_u3", "batch",
              dict(shadow_batch=True, walk_unroll=3),
              ref_probe=ref_probe)
        frame("batch_t4096", "batch",
              dict(shadow_batch=True, tile_r=4096), ref_probe=ref_probe)
        frame("batch_t1024", "batch",
              dict(shadow_batch=True, tile_r=1024), ref_probe=ref_probe)
        frame("batch_occnone", "batch",
              dict(shadow_batch=True, occ_mode="none"),
              ref_probe=ref_probe)

    # ---- trees: SAH bins + fatter leaves ------------------------------
    if "trees" in STEPS:
        frame("bins32_leaf98", "trees", {}, bins=32, ref_probe=ref_probe)
        frame("bins64_leaf98", "trees", {}, bins=64, ref_probe=ref_probe)
        frame("leaf140", "trees", dict(bvh_leaf=140), leaf=140,
              ref_probe=ref_probe)
        frame("leaf196", "trees", dict(bvh_leaf=196), leaf=196,
              ref_probe=ref_probe)

    # ---- arity8 retry under the new regime ----------------------------
    if "arity8" in STEPS:
        frame("arity8_leaf98", "arity8", dict(bvh_arity=8), arity=8,
              ref_probe=ref_probe)
        frame("arity8_leaf98_batch", "arity8",
              dict(bvh_arity=8, shadow_batch=True), arity=8,
              ref_probe=ref_probe)

    # ---- tailgather: compaction ingredient costs ----------------------
    if "tailgather" in STEPS:
        n = 1920 * 1080
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(n, 11)), jnp.float32)
        # clustered ~6% live mask (the flagship's measured segment-1
        # shape: ~126k live lanes concentrated in mirror-sphere tiles)
        lane = jnp.arange(n)
        live = (lane // 2048) % 16 == 0

        for C in (1 << 17, 1 << 18):
            def compact_roundtrip(x, live, C=C):
                pos = jnp.cumsum(live.astype(jnp.int32)) - 1
                src = jnp.where(live & (pos < C), pos, C)
                idx = jnp.zeros((C + 1,), jnp.int32).at[src].set(
                    lane.astype(jnp.int32), mode="drop")[:C]
                sel = jnp.take(x, idx, axis=0)            # C-row gather
                y = jnp.zeros((n, 3), jnp.float32).at[idx].add(
                    sel[:, :3], mode="drop")              # C-row scatter
                return y

            f = jax.jit(compact_roundtrip)
            c, t, _ = timed(lambda: f(x, live), reps=5)
            emit(step="tailgather", part="roundtrip", C=C, time_s=t,
                 compile_s=c)

            def index_only(live, C=C):
                pos = jnp.cumsum(live.astype(jnp.int32)) - 1
                src = jnp.where(live & (pos < C), pos, C)
                return jnp.zeros((C + 1,), jnp.int32).at[src].set(
                    lane.astype(jnp.int32), mode="drop")[:C]

            g = jax.jit(index_only)
            c, t, idx = timed(lambda: g(live), reps=5)
            emit(step="tailgather", part="index_build", C=C, time_s=t,
                 compile_s=c)
            idx = jax.block_until_ready(idx)

            h = jax.jit(lambda x, idx: jnp.take(x, idx, axis=0))
            c, t, _ = timed(lambda: h(x, idx), reps=5)
            emit(step="tailgather", part="gather_only", C=C, time_s=t,
                 compile_s=c)

    # ---- combo: best-of + fwd+bwd -------------------------------------
    if "combo" in STEPS:
        # read the session's own jsonl to pick the fastest EXACT variant
        best = None
        try:
            with open(OUT) as f:
                for line in f:
                    r = json.loads(line)
                    if (r.get("step") in ("base", "batch", "trees",
                                          "arity8")
                            and r.get("frame_s")
                            and r.get("probe_drift", 0.0) < 1e-3):
                        if best is None or r["frame_s"] < best["frame_s"]:
                            best = r
        except Exception:
            pass
        emit(step="combo_pick", best=best and best["variant"])

        from unity_raytracer_tpu.fit import get_params
        from unity_raytracer_tpu.ops.replay import (
            live_depth, replay_value_and_grad, trace_radiance_replay,
            trace_records)

        kw = {}
        leaf, bins, arity = cfg0.bvh_leaf, 16, 4
        if best:
            v = best["variant"]
            if "batch" in v:
                kw["shadow_batch"] = True
            if "u1" in v:
                kw["walk_unroll"] = 1
            if "u3" in v:
                kw["walk_unroll"] = 3
            if "t4096" in v:
                kw["tile_r"] = 4096
            if "t1024" in v:
                kw["tile_r"] = 1024
            if "occnone" in v:
                kw["occ_mode"] = "none"
            if "bins32" in v:
                bins = 32
            if "bins64" in v:
                bins = 64
            if "leaf140" in v:
                kw["bvh_leaf"] = leaf = 140
            if "leaf196" in v:
                kw["bvh_leaf"] = leaf = 196
            if "arity8" in v:
                kw["bvh_arity"] = arity = 8
        cfg = cfg0.with_(**kw)
        packed = packed_for(leaf=leaf, bins=bins, arity=arity)
        emit(step="combo_config", **kw, bins=bins)
        c, t, img = timed(lambda: render_frame(scene, cam, cfg,
                                               bvh=packed))
        emit(step="combo_fwd", compile_s=c, frame_s=t,
             rays_per_s=ISSUED / t, img_probe=float(jnp.mean(img)),
             probe_drift=(abs(float(jnp.mean(img)) - ref_probe)
                          if ref_probe else None))

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
        emit(step="combo_grad", compile_s=c, grad_s=t,
             rays_per_s_fwd_bwd=ISSUED / t, loss=float(vg[0]))

    emit(step="done")


if __name__ == "__main__":
    main()
