"""Round-5 TPU session B: cornell fused-fork kernel, mesh-vertex fit
artifact, AOT overlap evidence with the bandwidth-bound grad class.

Steps (default all):
  cornell  — config-2 A/B at 512^2/d4: composed tree path (r4: 86ms)
             vs the fused fork kernel (_trace_tree_mega) — VERDICT r5
             ask #5 (target >= 150M rays/s)
  meshfit  — FIT artifact: mesh-vertex deformation recovery on the
             composed XLA path with bind_verts + bvh_pad (VERDICT r5
             ask #3); writes FIT_r05_mesh.json
  aot      — AOT v5e:2x4 lowering of the sharded train step with
             'mesh_verts' among the parameter classes ([M,3,3] grads,
             ~3.7MB at 100k tris — the bandwidth-bound class ask #4
             needs); greps the schedule for async all-reduce
             start/done pairs spanning backward fusions
  vpu      — re-run the effective-VPU microbench (sanity)

Usage: python scripts/tpu_run.py scripts/tpu_r5b_session.py \
           [out.jsonl] [steps...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r5b.jsonl"
# aot BEFORE meshfit: the meshfit target render (XLA-path traversal on
# the remote chip) crashed the TPU worker once; a crash kills the
# process backend, so the riskier step goes last
STEPS = sys.argv[2:] or ["cornell", "aot", "meshfit"]


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

    from unity_raytracer_tpu.models.presets import cornell_box, mesh_scene
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import render_frame, resolve_mode

    # ---- cornell: fused fork kernel A/B at 512^2 ----------------------
    if "cornell" in STEPS:
        scene, cam, cfg = cornell_box()  # 512x512, d4, tree_cap=2
        cfg = resolve_mode(scene, cfg)
        issued = 512 * 512 * 5 * 3  # pixels * levels * (1 + 2 lights)
        c, t, img = timed(lambda: render_frame(scene, cam, cfg))
        ref_mean = float(jnp.mean(img))
        emit(step="cornell", variant="composed_tree", compile_s=c,
             frame_s=t, rays_per_s=issued / t, img_probe=ref_mean)
        for tile in (1024, 2048):
            try:
                cfg_f = cfg.with_(kernel="mega", tile_r=tile)
                c, t, img = timed(
                    lambda: render_frame(scene, cam, cfg_f))
                m = float(jnp.mean(img))
                emit(step="cornell", variant=f"fused_fork_t{tile}",
                     compile_s=c, frame_s=t, rays_per_s=issued / t,
                     img_probe=m, probe_drift=abs(m - ref_mean))
            except Exception as e:
                emit(step="cornell", variant=f"fused_fork_t{tile}",
                     error=repr(e)[:400])

    # ---- meshfit: mesh-vertex deformation recovery artifact -----------
    if "meshfit" in STEPS:
        import dataclasses

        from unity_raytracer_tpu.fit import FitConfig, fit
        from unity_raytracer_tpu.ops.render import render
        from unity_raytracer_tpu.utils.config import DiffConfig

        fscene, fcam, fcfg = mesh_scene(10240, width=192, height=192)
        fcfg = resolve_mode(fscene, fcfg.with_(
            use_bvh=True, kernel="xla", max_bounces=1, bvh_pad=0.4,
            ray_chunk=192 * 192 // 4, remat=True))
        fbvh = bvhmod.prepare_bvh(fscene, fcfg)
        target = render(fscene, fcam, fcfg, bvh=fbvh)
        true_v = np.asarray(fscene.meshes.verts)
        valid = np.asarray(fscene.meshes.valid)
        # dent 40 camera-facing triangles outward along their normals —
        # a large VISIBLE deformation (full-table random noise is
        # ill-posed from one view: in-plane moves are image-invisible)
        cent = true_v.mean(axis=1)
        to_cam = np.asarray(fcam.position) - cent
        to_cam /= np.maximum(
            np.linalg.norm(to_cam, axis=1, keepdims=True), 1e-9)
        nrm = np.asarray(fscene.meshes.normals)
        facing = np.argsort(-(nrm * to_cam).sum(axis=1) * valid)[:40]
        noise = np.zeros_like(true_v)
        # tilt: move only v0 along the face normal so the face normal
        # (and its shading) changes smoothly — a whole-face translation
        # along its own normal is nearly image-invariant
        noise[facing, 0, :] = 0.3 * nrm[facing]
        init = {"mesh_verts": jnp.asarray(true_v + noise)}
        fc = FitConfig(param_names=("mesh_verts",), learning_rate=0.01,
                       steps=80, soft_shadow_temp=1.0,
                       soft_hit_temp=0.05, log_every=10)
        t0 = time.perf_counter()
        res = fit(fscene, fcam, fcfg, target, fc, init_params=init,
                  bvh=fbvh)
        dt = time.perf_counter() - t0

        # recovery metric: the dented faces' NORMALS (positions are
        # ambiguous — any vertex combo restoring the plane matches)
        def fnorm(v):
            n = -np.cross(v[:, 2] - v[:, 0], v[:, 1] - v[:, 0])
            return n / np.maximum(
                np.linalg.norm(n, axis=1, keepdims=True), 1e-12)

        n_true = fnorm(true_v[facing])
        err0 = float((1 - (fnorm(np.asarray(init["mesh_verts"])[facing])
                           * n_true).sum(1)).mean())
        err1 = float((1 - (fnorm(np.asarray(
            res.params["mesh_verts"])[facing]) * n_true).sum(1)).mean())
        rec = {
            "scene": "mesh10k (10240-tri icosphere BVH), 192x192, "
                     "depth 1: 40 camera-facing triangles TILTED (v0 "
                     "moved 0.3 along the face normal); mesh-VERTEX "
                     "recovery on the composed XLA path (bind_verts + "
                     "bvh_pad=0.4), chunked/remat gradients, TPU; "
                     "recovery metric = dented-face normal error "
                     "(positions are ambiguous from one view)",
            "steps": fc.steps, "wall_s": dt,
            "loss_first": float(res.losses[0]),
            "loss_last": float(res.losses[-1]),
            "loss_curve": [float(x) for x in
                           res.losses[:: max(1, len(res.losses) // 20)]],
            "dented_rows": int(len(facing)),
            "normal_err_init_dented": err0,
            "normal_err_final_dented": err1,
            "n_params": int(np.prod(true_v.shape)),
        }
        with open("/root/repo/FIT_r05_mesh.json", "w") as f:
            json.dump(rec, f, indent=1)
        emit(step="meshfit", wall_s=dt, loss_first=rec["loss_first"],
             loss_last=rec["loss_last"], normal_err_init=err0,
             normal_err_final=err1)

    # ---- aot: async overlapped all-reduce with the mesh_verts class ---
    if "aot" in STEPS:
        import gzip

        import optax
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from unity_raytracer_tpu.fit import get_params
        from unity_raytracer_tpu.parallel.shard import (
            make_sharded_train_step)

        topo = None
        for tname in ("v5e:2x4", "v5litepod-8"):
            try:
                from jax.experimental import topologies
                topo = topologies.get_topology_desc(
                    platform="tpu", topology_name=tname)
                break
            except Exception as e:
                emit(step="aot_topo", name=tname, error=repr(e)[:200])
        emit(step="aot_topo", ok=topo is not None)
        # mesh10k first (cheap compile, [10240,3,3]=368KB grads); if the
        # scheduler still emits a synchronous all-reduce, escalate to
        # the 100k class ([102400,3,3]=3.7MB — the bandwidth-bound
        # bucket VERDICT r4 #4 names) at a smaller image
        for n_tris_aot, wh in ((10240, 128), (102400, 64)):
            if topo is None:
                break
            try:
                devs = np.array(list(topo.devices))
                mesh = Mesh(devs.reshape(-1, 1), ("dp", "tp"))
                s3, cam3, cfg3 = mesh_scene(n_tris_aot, width=wh,
                                            height=wh)
                cfg3 = resolve_mode(s3, cfg3.with_(
                    use_bvh=True, kernel="xla", max_bounces=1,
                    bvh_pad=0.1))
                bvh3 = bvhmod.prepare_bvh(s3, cfg3)
                names = ("mesh_verts", "sphere_centers",
                         "sphere_diffuse")
                params_c = get_params(s3, names)
                tx = optax.adam(1e-2)
                n = wh * wh
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
                                               mesh, names, tx,
                                               bvh=bvh3)
                lowered = step.lower(params_a, opt_a, ray_a, ray_a,
                                     ray_a)
                compiled = lowered.compile()
                txt = compiled.as_text()
                path = ("/root/repo/docs/measurements/"
                        f"aot_overlap_r5_hlo_{n_tris_aot}.txt.gz")
                with gzip.open(path, "wt") as f:
                    f.write(txt)
                lines = txt.splitlines()
                starts = [i for i, l in enumerate(lines)
                          if "all-reduce-start" in l]
                dones = [i for i, l in enumerate(lines)
                         if "all-reduce-done" in l]
                gaps = []
                for si in starts[:12]:
                    di = next((j for j in dones if j > si), None)
                    if di is not None:
                        body = [l.strip().split(" = ")[0]
                                for l in lines[si + 1:di]
                                if " = " in l]
                        big = [b for b in body
                               if any(k in b for k in
                                      ("fusion", "while", "dot",
                                       "convolution"))]
                        gaps.append({"start_line": si, "done_line": di,
                                     "n_ops_between": len(body),
                                     "n_compute_between": len(big),
                                     "sample_ops": body[:10]})
                emit(step="aot", ok=True, n_tris=n_tris_aot,
                     hlo_path=path, n_lines=len(lines),
                     n_starts=len(starts), n_dones=len(dones),
                     gaps=gaps)
                if starts:
                    break  # async pairs found — no escalation needed
            except Exception as e:
                emit(step="aot", ok=False, n_tris=n_tris_aot,
                     error=repr(e)[:600])

    # ---- vpu sanity ---------------------------------------------------
    if "vpu" in STEPS:
        def chain(x, iters, opi):
            def body(i, x):
                y = x
                for _ in range(opi // 5):
                    y = y * 1.000001 + 0.3
                    y = jnp.minimum(y, 8.0)
                    y = jnp.maximum(y * 0.999999, -8.0)
                    y = jnp.where(y > 0.5, y - 0.25, y)
                return y
            return jax.lax.fori_loop(0, iters, body, x)

        f = jax.jit(lambda x: chain(x, 4000, 100))
        x = jnp.ones((65536,), jnp.float32) * 0.1
        c, t, _ = timed(lambda: f(x), reps=5)
        emit(step="vpu", lanes=65536, time_s=t,
             counted_ops_per_s=65536 * 4000 * 100 / t)

    emit(step="done")


if __name__ == "__main__":
    main()
