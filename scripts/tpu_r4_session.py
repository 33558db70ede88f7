"""Round-4 TPU measurement session (one chip claim, JSONL output).

Steps (default all):
  vpu     — effective VPU rate microbenchmark on a leaf-test-shaped
            fused elementwise chain (calibrates the r4 compute-roofline
            denominator; the r2 ubench's 1.5 TF/s undershoots — the
            measured frame beat the modeled bound)
  profile — jax.profiler trace of 3 flagship frames -> docs/measurements
  sweep   — flagship A/B: Baldwin–Weber leaf records (tri_isect='bw'),
            light_cull thresholds, leaf re-sweep under bw, walk_unroll
  grad    — fwd+bwd at the best config: hard record-replay (with the
            dead-segment skip) + SOFT record-replay (min-mode records)
            + composed remat/chunked reference point
  fit512  — FIT_r04 artifact: 512x512 depth-4 mesh10k fit recovering
            sphere_centers + sphere_diffuse + light_positions on the
            soft-replay step

Usage: python scripts/tpu_run.py scripts/tpu_r4_session.py \
           [out.jsonl] [steps...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r4.jsonl"
STEPS = sys.argv[2:] or ["vpu", "profile", "sweep", "grad", "fit512",
                         "aot"]

ISSUED = 1920 * 1080 * 5 * 4  # pixels * segments * (1 + 3 lights)


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

    def packed_for(leaf, arity=4):
        key = (arity, leaf)
        if key not in packs:
            t0 = time.perf_counter()
            packs[key] = bvhmod.prepare_bvh(
                scene, cfg0.with_(bvh_arity=arity, bvh_leaf=leaf))
            emit(step="bvh_build", arity=arity, leaf=leaf,
                 time_s=time.perf_counter() - t0)
        return packs[key]

    # ---- vpu: effective counted-ops/s on a fused madd/select chain ----
    if "vpu" in STEPS:
        def chain(x, iters, ops_per_iter):
            # data-dependent chain of mul/add/min/max/select — the op
            # mix of a leaf triangle test; counted as 1 op each
            def body(i, x):
                y = x
                for k in range(ops_per_iter // 5):
                    y = y * 1.000001 + 0.3
                    y = jnp.minimum(y, 8.0)
                    y = jnp.maximum(y * 0.999999, -8.0)
                    y = jnp.where(y > 0.5, y - 0.25, y)
                return y
            return jax.lax.fori_loop(0, iters, body, x)

        for n_lanes in (2048, 65536):
            iters, opi = 4000, 100
            f = jax.jit(lambda x: chain(x, iters, opi))
            x = jnp.ones((n_lanes,), jnp.float32) * 0.1
            c, t, _ = timed(lambda: f(x), reps=5)
            total_ops = n_lanes * iters * (opi // 5) * 5
            emit(step="vpu", lanes=n_lanes, time_s=t,
                 counted_ops_per_s=total_ops / t, compile_s=c)

    # ---- profile: real XProf trace of the flagship frame --------------
    if "profile" in STEPS:
        packed = packed_for(56)
        cfg = cfg0
        # warm up / compile outside the trace
        c, t, img = timed(lambda: render_frame(scene, cam, cfg,
                                               bvh=packed))
        emit(step="profile_warmup", compile_s=c, frame_s=t)
        tdir = "/root/repo/docs/measurements/xprof_r4"
        os.makedirs(tdir, exist_ok=True)
        try:
            with jax.profiler.trace(tdir):
                for _ in range(3):
                    img = render_frame(scene, cam, cfg, bvh=packed)
                probe(img)
            files = []
            for root, _, fs in os.walk(tdir):
                for fn in fs:
                    p = os.path.join(root, fn)
                    files.append((os.path.relpath(p, tdir),
                                  os.path.getsize(p)))
            emit(step="profile", ok=True, files=files)
        except Exception as e:
            emit(step="profile", ok=False, error=repr(e)[:400])

    # ---- sweep: bw / light_cull / leaf / unroll -----------------------
    if "sweep" in STEPS:
        variants = [
            ("ship_mt_leaf56", dict(bvh_leaf=56)),
            ("bw_leaf56", dict(bvh_leaf=56, tri_isect="bw")),
            ("bw_leaf56_cull2", dict(bvh_leaf=56, tri_isect="bw",
                                     light_cull=2.0)),
            ("bw_leaf56_cull4", dict(bvh_leaf=56, tri_isect="bw",
                                     light_cull=4.0)),
            ("bw_leaf42", dict(bvh_leaf=42, tri_isect="bw")),
            ("bw_leaf70", dict(bvh_leaf=70, tri_isect="bw")),
            ("bw_leaf56_u3", dict(bvh_leaf=56, tri_isect="bw",
                                  walk_unroll=3)),
            ("bw_leaf56_fused", dict(bvh_leaf=56, tri_isect="bw",
                                     fuse_shadows=True)),
        ]
        ref_mean = None
        for name, kw in variants:
            try:
                cfg = cfg0.with_(**kw)
                packed = packed_for(kw.get("bvh_leaf", 56))
                c, t, img = timed(
                    lambda: render_frame(scene, cam, cfg, bvh=packed))
                m = float(jnp.mean(img))
                if ref_mean is None:
                    ref_mean = m
                emit(step="sweep", variant=name, compile_s=c, frame_s=t,
                     rays_per_s=ISSUED / t, img_probe=m,
                     probe_drift=abs(m - ref_mean))
            except Exception as e:
                emit(step="sweep", variant=name, error=repr(e)[:300])

    # ---- fatleaf: BW shifted the leaf-size economics — sweep upward ---
    if "fatleaf" in STEPS:
        for leaf in (70, 84, 98, 112):
            try:
                cfg = cfg0.with_(bvh_leaf=leaf, tri_isect="bw")
                packed = packed_for(leaf)
                c, t, img = timed(
                    lambda: render_frame(scene, cam, cfg, bvh=packed))
                emit(step="fatleaf", leaf=leaf, compile_s=c, frame_s=t,
                     rays_per_s=ISSUED / t,
                     img_probe=float(jnp.mean(img)))
            except Exception as e:
                emit(step="fatleaf", leaf=leaf, error=repr(e)[:300])
        # tile_r re-check under bw (the 2048-vs-1024 trade may shift too)
        for tile in (1024, 2048):
            try:
                cfg = cfg0.with_(bvh_leaf=70, tri_isect="bw",
                                 tile_r=tile)
                packed = packed_for(70)
                c, t, img = timed(
                    lambda: render_frame(scene, cam, cfg, bvh=packed))
                emit(step="fatleaf", leaf=70, tile_r=tile, compile_s=c,
                     frame_s=t, rays_per_s=ISSUED / t)
            except Exception as e:
                emit(step="fatleaf", tile_r=tile, error=repr(e)[:300])

    # ---- gate: leaf row-AABB sub-gating A/B ---------------------------
    if "gate" in STEPS:
        packed = packed_for(56)
        for name, kw in [
            ("bw_ref", dict(bvh_leaf=56, tri_isect="bw")),
            ("bw_gate", dict(bvh_leaf=56, tri_isect="bw",
                             leaf_gate=True)),
            ("bw_gate_cull4", dict(bvh_leaf=56, tri_isect="bw",
                                   leaf_gate=True, light_cull=4.0)),
        ]:
            try:
                cfg = cfg0.with_(**kw)
                c, t, img = timed(
                    lambda: render_frame(scene, cam, cfg, bvh=packed))
                emit(step="gate", variant=name, compile_s=c, frame_s=t,
                     rays_per_s=ISSUED / t,
                     img_probe=float(jnp.mean(img)))
            except Exception as e:
                emit(step="gate", variant=name, error=repr(e)[:300])

    # ---- grad: fwd+bwd at the best sweep config -----------------------
    if "grad" in STEPS:
        from unity_raytracer_tpu.fit import (get_params,
                                             make_chunked_value_and_grad)
        from unity_raytracer_tpu.ops.render import trace_radiance
        from unity_raytracer_tpu.ops.replay import (
            live_depth, replay_value_and_grad,
            soft_replay_value_and_grad, trace_radiance_replay,
            trace_radiance_replay_soft, trace_records)
        from unity_raytracer_tpu.utils.config import DiffConfig

        # headline fwd+bwd at the EXACT-mode preset defaults (bw leaves,
        # no cull); a cull-4 variant is timed separately below
        kw = dict(bvh_leaf=cfg0.bvh_leaf, tri_isect=cfg0.tri_isect)
        cfg = cfg0.with_(**kw)
        packed = packed_for(kw["bvh_leaf"])
        emit(step="grad_config", **kw)
        # preset-default forward, for the same-session reference
        c, t, img = timed(lambda: render_frame(scene, cam, cfg,
                                               bvh=packed))
        emit(step="grad_fwd_ref", compile_s=c, frame_s=t,
             rays_per_s=ISSUED / t)

        names = ("sphere_centers", "sphere_diffuse", "light_intensities")
        params0 = get_params(scene, names)
        o, d = generate_rays_blocks(cam, cfg.block_size)

        target = jax.block_until_ready(jax.lax.stop_gradient(
            trace_radiance_replay(scene, o, d, cfg, packed))) * 0.9
        _, recs = trace_records(scene, o, d, cfg, packed)
        k = live_depth(recs)
        emit(step="replay_live_segments", k=k)
        c, t, vg = timed(lambda: replay_value_and_grad(
            scene, params0, o, d, target, cfg, packed,
            live_segments=k), reps=2)
        gnorm = float(sum(float(jnp.sum(g * g)) for g in vg[1].values()))
        emit(step="grad_replay", compile_s=c, grad_s=t,
             rays_per_s_fwd_bwd=ISSUED / t, loss=float(vg[0]),
             grad_sq_norm=gnorm)

        # cull-4 variant of the same step (the bounded-error perf mode)
        try:
            cfg_c4 = cfg.with_(light_cull=4.0)
            t4 = jax.block_until_ready(jax.lax.stop_gradient(
                trace_radiance_replay(scene, o, d, cfg_c4, packed))) * 0.9
            c, t, vg = timed(lambda: replay_value_and_grad(
                scene, params0, o, d, t4, cfg_c4, packed,
                live_segments=k), reps=2)
            emit(step="grad_replay_cull4", compile_s=c, grad_s=t,
                 rays_per_s_fwd_bwd=ISSUED / t, loss=float(vg[0]))
        except Exception as e:
            emit(step="grad_replay_cull4", error=repr(e)[:300])

        cfg_s = cfg.with_(diff=DiffConfig(soft_shadow_temp=1.0,
                                          soft_hit_temp=0.1,
                                          straight_through=True))
        target_s = jax.block_until_ready(jax.lax.stop_gradient(
            trace_radiance_replay_soft(scene, o, d, cfg_s, packed,
                                       chunk=1 << 18))) * 0.9
        c, t, vg = timed(lambda: soft_replay_value_and_grad(
            scene, params0, o, d, target_s, cfg_s, packed,
            live_segments=k, chunk=1 << 18), reps=2)
        gnorm = float(sum(float(jnp.sum(g * g)) for g in vg[1].values()))
        emit(step="grad_soft_replay", compile_s=c, grad_s=t,
             rays_per_s_fwd_bwd=ISSUED / t, loss=float(vg[0]),
             grad_sq_norm=gnorm)

        try:
            cfg_c = cfg.with_(kernel="pallas", remat=True)
            target_c = jax.block_until_ready(jax.lax.stop_gradient(
                trace_radiance(scene, o, d, cfg_c, bvh=packed))) * 0.9
            vgf = jax.jit(make_chunked_value_and_grad(
                scene, cfg_c, o, d, target_c, bvh=packed, chunk=1 << 18))
            c, t, vg = timed(lambda: vgf(params0), reps=1)
            emit(step="grad_composed", compile_s=c, grad_s=t,
                 rays_per_s_fwd_bwd=ISSUED / t, loss=float(vg[0]))
        except Exception as e:
            emit(step="grad_composed", error=repr(e)[:300])

    # ---- softdecomp: where do the soft fwd+bwd 657ms go? --------------
    if "softdecomp" in STEPS:
        from unity_raytracer_tpu.fit import get_params
        from unity_raytracer_tpu.ops.replay import (
            _chunk_records, live_depth, replay_radiance_soft,
            soft_replay_value_and_grad, trace_records)
        from unity_raytracer_tpu.utils.config import DiffConfig

        cfg = cfg0.with_(bvh_leaf=56, tri_isect="bw")
        cfg_s = cfg.with_(diff=DiffConfig(soft_shadow_temp=1.0,
                                          soft_hit_temp=0.1,
                                          straight_through=True))
        packed = packed_for(56)
        o, d = generate_rays_blocks(cam, cfg.block_size)
        names = ("sphere_centers", "sphere_diffuse", "light_intensities")
        params0 = get_params(scene, names)

        import functools as ft

        rec_hard = jax.jit(ft.partial(
            lambda s, o_, d_: trace_records(s, o_, d_, cfg, packed)[1]))
        c, t, recs_h = timed(lambda: rec_hard(scene, o, d), reps=3)
        emit(step="softdecomp", part="records_hard", time_s=t,
             compile_s=c)
        rec_soft = jax.jit(ft.partial(
            lambda s, o_, d_: trace_records(s, o_, d_, cfg_s, packed,
                                            soft=True)[1]))
        c, t, recs_s = timed(lambda: rec_soft(scene, o, d), reps=3)
        emit(step="softdecomp", part="records_soft_minmode", time_s=t,
             compile_s=c)

        k = live_depth(recs_s)
        recs_s = jax.block_until_ready(recs_s)
        target = jnp.zeros_like(o)  # timing only

        # replay-only chunked VG on FIXED records (no kernel pass)
        def replay_only_vg(params, recs, chunk):
            from unity_raytracer_tpu.fit import set_params
            oc, dc, tc, wc, rc, n_eff = _chunk_records(
                o, d, target, None, recs, chunk)

            def body(carry, xs):
                ls, gs = carry
                o_i, d_i, t_i, w_i, r_i = xs

                def chunk_loss(p):
                    s = set_params(scene, p)
                    rad = replay_radiance_soft(s, o_i, d_i, r_i, cfg_s,
                                               live_segments=k)
                    return jnp.sum(((rad - t_i) ** 2) * w_i[:, None])

                l_i, g_i = jax.value_and_grad(chunk_loss)(params)
                return (ls + l_i, jax.tree.map(jnp.add, gs, g_i)), None

            zero = (jnp.zeros((), jnp.float32),
                    jax.tree.map(jnp.zeros_like, params))
            (loss, grads), _ = jax.lax.scan(body, zero,
                                            (oc, dc, tc, wc, rc))
            return loss / (n_eff * 3.0), grads

        for ch in (1 << 18, 1 << 19, 1 << 20):
            try:
                f = jax.jit(ft.partial(replay_only_vg, chunk=ch))
                c, t, _ = timed(lambda: f(params0, recs_s), reps=2)
                emit(step="softdecomp", part=f"replay_only_vg_c{ch}",
                     time_s=t, compile_s=c)
            except Exception as e:
                emit(step="softdecomp", part=f"replay_only_vg_c{ch}",
                     error=repr(e)[:300])

        # end-to-end soft VG at the bigger chunk
        for ch in (1 << 19, 1 << 20):
            try:
                c, t, _ = timed(lambda: soft_replay_value_and_grad(
                    scene, params0, o, d, target, cfg_s, packed,
                    live_segments=k, chunk=ch), reps=2)
                emit(step="softdecomp", part=f"soft_vg_e2e_c{ch}",
                     time_s=t, compile_s=c,
                     rays_per_s_fwd_bwd=ISSUED / t)
            except Exception as e:
                emit(step="softdecomp", part=f"soft_vg_e2e_c{ch}",
                     error=repr(e)[:300])

    # ---- profile_soft: XProf the replay-only soft VG ------------------
    if "profile_soft" in STEPS:
        import functools as ft
        import glob
        import gzip

        from unity_raytracer_tpu.fit import get_params, set_params
        from unity_raytracer_tpu.ops.replay import (
            _chunk_records, live_depth, replay_radiance_soft,
            trace_records)
        from unity_raytracer_tpu.utils.config import DiffConfig

        cfg = cfg0.with_(bvh_leaf=56, tri_isect="bw")
        cfg_s = cfg.with_(diff=DiffConfig(soft_shadow_temp=1.0,
                                          soft_hit_temp=0.1,
                                          straight_through=True))
        packed = packed_for(56)
        o, d = generate_rays_blocks(cam, cfg.block_size)
        names = ("sphere_centers", "sphere_diffuse", "light_intensities")
        params0 = get_params(scene, names)
        recs_s = jax.block_until_ready(jax.jit(
            lambda: trace_records(scene, o, d, cfg_s, packed,
                                  soft=True)[1])())
        k = live_depth(recs_s)
        target = jnp.zeros_like(o)

        def replay_only_vg(params, recs, chunk=1 << 18):
            oc, dc, tc, wc, rc, n_eff = _chunk_records(
                o, d, target, None, recs, chunk)

            def body(carry, xs):
                ls, gs = carry
                o_i, d_i, t_i, w_i, r_i = xs

                def chunk_loss(p):
                    s = set_params(scene, p)
                    rad = replay_radiance_soft(s, o_i, d_i, r_i, cfg_s,
                                               live_segments=k)
                    return jnp.sum(((rad - t_i) ** 2) * w_i[:, None])

                l_i, g_i = jax.value_and_grad(chunk_loss)(params)
                return (ls + l_i, jax.tree.map(jnp.add, gs, g_i)), None

            zero = (jnp.zeros((), jnp.float32),
                    jax.tree.map(jnp.zeros_like, params))
            (loss, grads), _ = jax.lax.scan(body, zero,
                                            (oc, dc, tc, wc, rc))
            return loss / (n_eff * 3.0), grads

        f = jax.jit(replay_only_vg)
        c, t, _ = timed(lambda: f(params0, recs_s), reps=2)
        emit(step="profile_soft_warmup", time_s=t, compile_s=c)
        tdir = "/tmp/xprof_soft"
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            out = f(params0, recs_s)
            probe(out)
        # in-session summary: top device ops by total duration
        try:
            import collections
            paths = glob.glob(tdir + "/**/*.trace.json.gz",
                              recursive=True)
            dd = json.load(gzip.open(paths[0], "rt"))
            evs = dd["traceEvents"] if isinstance(dd, dict) else dd
            durs = collections.Counter()
            for e in evs:
                if e.get("ph") == "X" and "dur" in e:
                    durs[e.get("name", "?")] += e["dur"]
            top = [[n[:120], round(us / 1e3, 2)]
                   for n, us in durs.most_common(30)]
            emit(step="profile_soft", top_ms=top, trace=paths[0])
        except Exception as e:
            emit(step="profile_soft", error=repr(e)[:300])

    # ---- fit512: FIT_r04 artifact on the soft-replay step -------------
    if "fit512" in STEPS:
        from unity_raytracer_tpu.fit import FitConfig, fit, get_params
        from unity_raytracer_tpu.models.presets import mesh_scene
        from unity_raytracer_tpu.ops.render import render

        fscene, fcam, fcfg0 = mesh_scene(10240, width=512, height=512)
        fcfg0 = resolve_mode(fscene, fcfg0.with_(use_bvh=True,
                                                 kernel="mega"))
        fbvh = bvhmod.prepare_bvh(fscene, fcfg0)
        target = render(fscene, fcam, fcfg0, bvh=fbvh)
        names = ("sphere_centers", "sphere_diffuse", "light_positions")
        true_p = get_params(fscene, names)
        def pert(name, rows):
            base = np.zeros(np.asarray(true_p[name]).shape, np.float32)
            base[:len(rows)] = rows
            return true_p[name] + jnp.asarray(base)

        init = {
            "sphere_centers": pert("sphere_centers", [[0.6, -0.4, 0.5]]),
            "sphere_diffuse": jnp.clip(
                pert("sphere_diffuse", [[0.2, 0.15, -0.08]]), 0, 1),
            "light_positions": pert("light_positions",
                                    [[1.5, -1.0, 1.0], [-1.0, 1.5, -1.0],
                                     [1.0, 1.0, 1.5]]),
        }
        fc = FitConfig(param_names=names, learning_rate=0.03, steps=200,
                       soft_shadow_temp=1.0, soft_hit_temp=0.1,
                       log_every=25, use_replay=True)
        t0 = time.perf_counter()
        res = fit(fscene, fcam, fcfg0, target, fc, init_params=init,
                  bvh=fbvh)
        dt = time.perf_counter() - t0
        rec = {
            "scene": "mesh10k BVH (10k tris), 512x512, depth 4 (full "
                     "preset depth), soft record-replay step "
                     "(megakernel fwd + differentiable replay bwd), TPU",
            "steps": fc.steps, "wall_s": dt,
            "step_s_incl_compile": dt / fc.steps,
            "loss_curve": [float(x) for x in
                           res.losses[:: max(1, len(res.losses) // 20)]],
            "loss_first": float(res.losses[0]),
            "loss_last": float(res.losses[-1]),
        }
        for k in names:
            rec[f"recovered_{k}"] = np.asarray(res.params[k]).tolist()
            rec[f"true_{k}"] = np.asarray(true_p[k]).tolist()
            rec[f"init_{k}"] = np.asarray(init[k]).tolist()
        with open("/root/repo/FIT_r04.json", "w") as f:
            json.dump(rec, f, indent=1)
        emit(step="fit512", wall_s=dt, loss_first=rec["loss_first"],
             loss_last=rec["loss_last"])

    # ---- aot: TPU-topology AOT lowering of the sharded train step ----
    # VERDICT r3 next-step #4: produce the actual TPU-scheduled module
    # for an 8-device mesh WITHOUT owning 8 chips, showing the gradient
    # all-reduce start/done pair interleaved with backward fusions.
    if "aot" in STEPS:
        import gzip

        import optax
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from unity_raytracer_tpu.fit import get_params
        from unity_raytracer_tpu.models.presets import three_spheres
        from unity_raytracer_tpu.parallel.shard import (
            make_sharded_train_step)

        topo = None
        attempts = []
        for tname in ("v5e:2x4", "v5litepod-8", "v5e-8", "v5e:4x2"):
            try:
                from jax.experimental import topologies
                topo = topologies.get_topology_desc(
                    platform="tpu", topology_name=tname)
                attempts.append([tname, "ok"])
                break
            except Exception as e:
                attempts.append([tname, repr(e)[:200]])
        emit(step="aot_topo", attempts=attempts, ok=topo is not None)
        if topo is not None:
            try:
                devs = np.array(list(topo.devices))
                # axis names must match parallel.shard.RAY_AXIS ('dp')
                mesh = Mesh(devs.reshape(-1, 1), ("dp", "tp"))
                s3, cam3, cfg3 = three_spheres(width=64, height=64)
                cfg3 = resolve_mode(s3, cfg3)
                names = ("sphere_centers", "sphere_diffuse")
                params_c = get_params(s3, names)
                tx = optax.adam(1e-2)
                n = 64 * 64
                sh_r = NamedSharding(mesh, P("dp"))
                sh_rep = NamedSharding(mesh, P())
                params_a = {
                    k: jax.ShapeDtypeStruct(np.shape(v), jnp.float32,
                                            sharding=sh_rep)
                    for k, v in params_c.items()}
                ray_a = jax.ShapeDtypeStruct((n, 3), jnp.float32,
                                             sharding=sh_r)
                opt_a = jax.eval_shape(tx.init, params_a)
                opt_a = jax.tree.map(
                    lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                                   sharding=sh_rep),
                    opt_a)
                step = make_sharded_train_step(s3, cam3, cfg3, None,
                                               mesh, names, tx)
                lowered = step.lower(params_a, opt_a, ray_a, ray_a,
                                     ray_a)
                compiled = lowered.compile()
                txt = compiled.as_text()
                path = ("/root/repo/docs/measurements/"
                        "aot_overlap_r4_hlo.txt.gz")
                with gzip.open(path, "wt") as f:
                    f.write(txt)
                lines = txt.splitlines()
                starts = [i for i, l in enumerate(lines)
                          if "all-reduce-start" in l]
                dones = [i for i, l in enumerate(lines)
                         if "all-reduce-done" in l]
                # ops scheduled between each start and its done — the
                # overlap evidence
                gaps = []
                for si in starts[:8]:
                    di = next((j for j in dones if j > si), None)
                    if di is not None:
                        body = [l.strip().split(" = ")[0]
                                for l in lines[si + 1:di]
                                if " = " in l]
                        gaps.append({"start_line": si, "done_line": di,
                                     "n_ops_between": len(body),
                                     "sample_ops": body[:12]})
                emit(step="aot", ok=True, hlo_path=path,
                     n_lines=len(lines), n_starts=len(starts),
                     n_dones=len(dones), gaps=gaps)
            except Exception as e:
                emit(step="aot", ok=False, error=repr(e)[:500])

    emit(step="done")


if __name__ == "__main__":
    main()
