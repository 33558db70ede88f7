"""Benchmark harness — flagship: rays/s/chip, 1080p, depth-4, 100k-tri BVH.

Prints ONE JSON line to stdout:
  {"metric", "value", "unit", "vs_baseline",
   "rays_per_s_fwd", "rays_per_s_fwd_bwd", "rays_per_s_live",
   "frame_s", "grad_s", "fraction_of_roofline", ...}
The reference publishes no numbers (BASELINE.md) — vs_baseline is measured
against the north-star target of 1e9 rays/s/chip.

Ray accounting (two numbers, both reported):
* issued — pixels * segments * (1 + lights): every query slot the
  wavefront issues, live or not (the headline; standard accounting and
  what vs_baseline uses).
* live — the sum of actually-live nearest + shadow query lanes per
  segment (measured by trace_radiance_stats); after bounce 0 most lanes
  are retired, so this is the honest "useful rays" number.

Timing methodology: mean over repeats enqueued back-to-back, synced
once by a 4-BYTE scalar probe — np.asarray on the full image would
drag 25MB through the remote-TPU tunnel (~0.8s, measured) and
per-repeat syncing would add the tunnel's ~30-40ms dispatch round-trip
to every repeat.

fwd+bwd: value_and_grad of a pixel-MSE w.r.t. sphere centers, sphere
diffuse, and light intensities — the inverse-rendering parameter
classes (fit.py). Two measured paths:
* replay (headline) — megakernel forward with hit recording + the
  gather-free differentiable shading replay (ops/replay.py);
* composed — the general soft-temp path, with cfg.remat (checkpointed
  bounce scan) + chunked gradient accumulation
  (fit.make_chunked_value_and_grad) bounding backward memory.

Usage: python bench.py [--preset mesh100k] [--width W --height H]
                       [--repeats N] [--no-bvh] [--no-grad] [--all]
                       [--kernel mega|pallas|pallas3|xla]
"""

import argparse
import json
import sys
import time

import numpy as np


def count_rays(max_bounces, width, height, n_lights):
    """Issued query slots per frame for the linear chain renderer."""
    pixels = width * height
    segments = max_bounces + 1
    return pixels * segments * (1 + n_lights)


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"[bench] compile cache unavailable: {e}", file=sys.stderr)


def _with_timeout(fn, seconds, label):
    """Run fn() on a daemon thread with a hard join timeout.

    The remote-TPU tunnel can wedge indefinitely (a hung compile helper
    blocks forever, not with an exception); auxiliary bench sections
    must not take the flagship number down with them. On timeout the
    daemon thread is abandoned (process exit reaps it) and None is
    returned.
    """
    import threading
    box = {}

    def run():
        try:
            box["out"] = fn()
        except Exception as e:  # noqa: BLE001 — report, don't die
            box["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        print(f"[bench] {label} timed out after {seconds}s",
              file=sys.stderr)
        return None
    if "err" in box:
        print(f"[bench] {label} failed: {box['err']}", file=sys.stderr)
        return None
    return box.get("out")


def _timed(fn, repeats=3):
    """Steady-state throughput timing: enqueue ``repeats`` calls
    back-to-back and sync once on a 4-byte scalar probe of the last
    output. Per-call sync would add the remote-chip tunnel's ~30-40ms
    dispatch round-trip to EVERY repeat (measured r3); enqueueing
    amortizes it, matching how frames are actually consumed."""
    import jax

    def sync(out):
        return float(jax.tree.leaves(out)[0].ravel()[0])

    t0 = time.perf_counter()
    sync(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn()
    sync(out)
    return compile_s, (time.perf_counter() - t0) / repeats


def run_once(name="mesh100k", width=None, height=None, repeats=3,
             use_bvh=True, max_bounces=None, kernel=None, grad=True):
    import jax
    import jax.numpy as jnp

    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import get_preset
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import (
        render_frame, resolve_mode, trace_radiance, trace_radiance_stats)
    from unity_raytracer_tpu.utils import profiling

    kw = {}
    if width:
        kw["width"] = width
    if height:
        kw["height"] = height
    scene, cam, cfg = get_preset(name, **kw)
    cfg = resolve_mode(scene, cfg.with_(use_bvh=use_bvh))
    if max_bounces is not None:
        cfg = cfg.with_(max_bounces=max_bounces)

    on_tpu = jax.default_backend() != "cpu"
    has_mesh = int(np.asarray(scene.meshes.valid).sum()) > 0
    if kernel is None:
        # megakernel: TPU + BVH + hard mirror chain; the dielectric
        # TREE path also routes through the fused fork kernel on TPU
        # (_trace_tree_mega — meshless cornell runs has_mesh=False)
        kernel = ("mega" if (on_tpu
                             and ((use_bvh and has_mesh
                                   and cfg.mode == "scan")
                                  or cfg.mode == "tree"))
                  else cfg.kernel)
    cfg = cfg.with_(kernel=kernel)

    bvh = None
    build_s = 0.0
    if use_bvh and has_mesh:
        t0 = time.perf_counter()
        bvh = bvhmod.prepare_bvh(scene, cfg)
        build_s = time.perf_counter() - t0

    # ---- forward ----------------------------------------------------------
    compile_s, frame_s = _timed(
        lambda: render_frame(scene, cam, cfg, bvh=bvh), repeats)

    n_lights = int(np.asarray(scene.lights.valid).sum())
    issued = count_rays(cfg.max_bounces, cam.width, cam.height, n_lights)
    fwd = issued / frame_s

    # ---- tree-mode truncation audit (advisor r4: the tree_cap drop is
    # silent accuracy loss; the remote-TPU backend rejects the host-
    # callback warning, so surface it as a plain array output here) -----
    tree_truncated = None
    if cfg.mode == "tree":
        def _trunc():
            from unity_raytracer_tpu.ops.render import (
                trace_radiance_tree_stats)
            o, d = generate_rays_blocks(cam, cfg.block_size)
            _, n_tr = jax.block_until_ready(trace_radiance_tree_stats(
                scene, o, d, cfg, bvh=bvh))
            return int(np.asarray(n_tr))
        tree_truncated = _with_timeout(_trunc, 420, "tree-cap audit")
        if tree_truncated:
            print(f"[bench] WARNING: tree_cap={cfg.tree_cap} truncated "
                  f"{tree_truncated} live lanes (accuracy loss — raise "
                  f"tree_cap)", file=sys.stderr)

    # ---- live-lane accounting (composed stats path, not timed) ------------
    live_rays = None
    if cfg.mode == "scan":
        def _stats():
            cfg_stats = cfg.with_(
                kernel="pallas" if kernel == "mega" else kernel)
            o, d = generate_rays_blocks(cam, cfg_stats.block_size)
            _, (live, shadow) = jax.block_until_ready(
                trace_radiance_stats(scene, o, d, cfg_stats, bvh=bvh))
            return int(np.asarray(live).sum() + np.asarray(shadow).sum())
        live_rays = _with_timeout(_stats, 420, "live-lane stats")

    # ---- fwd+bwd ----------------------------------------------------------
    # Headline: record-replay backward (ops/replay.py) — megakernel
    # forward emits hit records, gradients come from a gather-free
    # differentiable shading replay. Secondary: the composed
    # differentiable path with remat + chunked gradient accumulation
    # (the soft-temp/fitting path; memory-bounded, so no 1080p OOM).
    names = ("sphere_centers", "sphere_diffuse", "light_intensities")
    grad_s = None
    fwd_bwd = None
    grad_composed_s = None
    fwd_bwd_composed = None
    grad_soft_s = None
    fwd_bwd_soft = None
    if grad:
        from unity_raytracer_tpu.fit import (get_params,
                                             make_chunked_value_and_grad)
        params0 = get_params(scene, names)
        o, d = generate_rays_blocks(cam, cfg.block_size)

        if (kernel == "mega" and bvh is not None
                and getattr(bvh, "leafmeta", None) is not None):
            def _grad_replay():
                from unity_raytracer_tpu.ops.replay import (
                    live_depth, replay_value_and_grad, trace_records,
                    trace_radiance_replay)
                # 0.9x so the loss/grads are nonzero (real backward
                # values, not a zero-cotangent special case)
                target = jax.lax.stop_gradient(trace_radiance_replay(
                    scene, o, d, cfg, bvh)) * 0.9
                # static live prefix: replay only the segments that
                # carry live records (exact; measured once)
                _, recs = trace_records(scene, o, d, cfg, bvh)
                k = live_depth(recs)
                print(json.dumps({"replay_live_segments": k}),
                      file=sys.stderr)
                gc, gs = _timed(
                    lambda: replay_value_and_grad(
                        scene, params0, o, d, target, cfg, bvh,
                        live_segments=k),
                    max(1, repeats - 1))
                print(json.dumps({"grad_replay_compile_s": round(gc, 1)}),
                      file=sys.stderr)
                return gs
            grad_s = _with_timeout(_grad_replay, 600, "fwd+bwd (replay)")
            if grad_s:
                fwd_bwd = issued / grad_s

        # soft fwd+bwd: the silhouette-fitting path at megakernel speed
        # (min-mode shadow records + differentiable soft replay)
        if (kernel == "mega" and bvh is not None
                and getattr(bvh, "leafmeta", None) is not None):
            def _grad_soft():
                from unity_raytracer_tpu.ops.replay import (
                    live_depth, soft_replay_value_and_grad,
                    trace_records, trace_radiance_replay_soft)
                from unity_raytracer_tpu.utils.config import DiffConfig
                cfg_s = cfg.with_(diff=DiffConfig(
                    soft_shadow_temp=1.0, soft_hit_temp=0.1,
                    straight_through=True))
                ch = 1 << 18  # bound the pure-jnp replay working set
                target = jax.lax.stop_gradient(trace_radiance_replay_soft(
                    scene, o, d, cfg_s, bvh, chunk=ch)) * 0.9
                _, recs = trace_records(scene, o, d, cfg_s, bvh,
                                        soft=True)
                k = live_depth(recs)
                gc, gs = _timed(
                    lambda: soft_replay_value_and_grad(
                        scene, params0, o, d, target, cfg_s, bvh,
                        live_segments=k, chunk=ch),
                    max(1, repeats - 1))
                print(json.dumps({"grad_soft_compile_s": round(gc, 1)}),
                      file=sys.stderr)
                return gs
            grad_soft_s = _with_timeout(_grad_soft, 600,
                                        "fwd+bwd (soft replay)")
            if grad_soft_s:
                fwd_bwd_soft = issued / grad_soft_s

        def _grad_composed():
            cfg_g = cfg.with_(
                kernel="pallas" if kernel == "mega" else kernel,
                remat=True)
            target = jax.lax.stop_gradient(
                trace_radiance(scene, o, d, cfg_g, bvh=bvh)) * 0.9
            chunk = cfg.ray_chunk or min(o.shape[0], 1 << 18)
            vg = jax.jit(make_chunked_value_and_grad(
                scene, cfg_g, o, d, target, bvh=bvh, chunk=chunk))
            gc, gs = _timed(lambda: vg(params0), max(1, repeats - 1))
            print(json.dumps({"grad_composed_compile_s": round(gc, 1)}),
                  file=sys.stderr)
            return gs
        grad_composed_s = _with_timeout(_grad_composed, 900,
                                        "fwd+bwd (composed remat)")
        if grad_composed_s:
            fwd_bwd_composed = issued / grad_composed_s
        if grad_s is None:  # no megakernel path -> composed is the number
            grad_s = grad_composed_s
            fwd_bwd = fwd_bwd_composed

    # ---- rooflines (both, labeled — VERDICT r2 weak #1) -------------------
    # HBM model: the megakernel's only HBM traffic is per-lane ray state,
    # ~23 f32 streams per segment-lane (10 in + 13 out); scene/BVH blocks
    # are VMEM-resident. Per issued query: 23*4/(1+L) bytes.
    bytes_per_ray = 23.0 * 4.0 / (1 + n_lights)
    roof = profiling.roofline(fwd, bytes_per_ray)
    # Compute model re-derived for the SHIPPED leaf-56/arity-4 tree
    # (scripts/roofline_r4.py, FULL-frame union-walk simulation — the
    # r1-r3 830e6 figure was modeled on the retired leaf-14 tree):
    # 164.6 GFLOP/frame counted at the kernel's per-visit op counts
    # (nearest 34.0 + per-light shadow walks 96.7 + bounce tail 31.9 +
    # shade 2.0); the Baldwin-Weber leaf records (tri_isect='bw') cut
    # it to 111.3. The bound divides by the effective VPU rate measured
    # by the r4 on-chip fused-elementwise microbenchmark (see
    # docs/KERNELS.md r4 section); both model inputs are printed so the
    # fraction is auditable. Flagship-scene-specific; scaled by pixel
    # count for other resolutions of the same scene.
    # keyed by (tri_isect, bvh_leaf, sah_bins); note leaf 98 MODELS
    # more flops than 56 yet MEASURES faster — the regime is
    # step-overhead-bound, not leaf-flop-bound. The bins-64 entry is
    # the r5 re-derivation (scripts/roofline_r5.py, same full-frame
    # union-walk method) for the shipped finer-SAH tree.
    MODEL_GFLOP_1080P = {("mt", 56, 16): 164.6, ("bw", 56, 16): 111.3,
                         ("mt", 98, 16): 201.9, ("bw", 98, 16): 129.5,
                         ("bw", 98, 32): 125.7, ("bw", 98, 64): 123.5,
                         ("bw", 140, 16): 146.2, ("bw", 196, 16): 170.6}
    # measured counted-ops/s of a 65536-lane fused mul/add/min/max/select
    # chain on this chip (r4 session, docs/measurements/tpu_r4.jsonl
    # step="vpu") — the realistic VPU ceiling for leaf-test-shaped code
    VPU_EFF = 2.12e12
    compute_bound = None
    model_gflop = None
    if name == "mesh100k" and kernel == "mega":
        key = (getattr(cfg, "tri_isect", "mt"),
               getattr(cfg, "bvh_leaf", 56),
               getattr(cfg, "bvh_bins", 16))
        base = MODEL_GFLOP_1080P.get(key)
        if base:
            model_gflop = base * (cam.width * cam.height) / (1920 * 1080)
            compute_bound = issued / (model_gflop * 1e9 / VPU_EFF)
    frac_compute = (fwd / compute_bound) if compute_bound else None
    frac_compute_fb = ((fwd_bwd / compute_bound)
                       if compute_bound and fwd_bwd else None)
    frac_compute_soft = ((fwd_bwd_soft / compute_bound)
                         if compute_bound and fwd_bwd_soft else None)

    return {
        "preset": name,
        "width": cam.width,
        "height": cam.height,
        "depth": cfg.max_bounces,
        "lights": n_lights,
        "mesh_tris": int(np.asarray(scene.meshes.valid).sum()),
        "kernel": kernel,
        "use_bvh": bvh is not None,
        "bvh_build_s": round(build_s, 3),
        "compile_s": round(compile_s, 2),
        "frame_s": frame_s,
        "grad_s": grad_s,
        "grad_composed_s": grad_composed_s,
        "grad_soft_s": grad_soft_s,
        "rays_issued": issued,
        "rays_live": live_rays,
        "tree_truncated": tree_truncated,
        "rays_per_s_fwd": fwd,
        "rays_per_s_fwd_bwd": fwd_bwd,
        "rays_per_s_fwd_bwd_composed": fwd_bwd_composed,
        "rays_per_s_fwd_bwd_soft": fwd_bwd_soft,
        "rays_per_s_live": (live_rays / frame_s) if live_rays else None,
        "fraction_of_hbm_roofline": roof["fraction_of_roofline"],
        "hbm_bound_rays_per_s": roof["hbm_bound_rays_per_s"],
        "fraction_of_compute_roofline": frac_compute,
        "fraction_of_compute_roofline_fwd_bwd": frac_compute_fb,
        "fraction_of_compute_roofline_fwd_bwd_soft": frac_compute_soft,
        "compute_bound_rays_per_s": compute_bound,
        "compute_model_gflop_frame": model_gflop,
        "device": str(jax.devices()[0]),
    }


def run_sharded(name="mesh10k", width=None, height=None, repeats=2,
                counts=(1, 2, 4, 8)):
    """Scaling harness: rays/s vs device count on the available mesh
    (real chips on a pod slice; virtual CPU devices with --virtual N).

    Emits one JSON record per device count with efficiency relative to
    the 1-device run — the BASELINE ">=85% 1 chip -> N" measurement
    harness. (On virtual CPU devices the numbers prove the harness and
    sharding, not real scaling.) Call parallel.bootstrap.maybe_initialize
    first on multi-host deployments.
    """
    import jax

    from unity_raytracer_tpu.models.presets import get_preset
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import resolve_mode
    from unity_raytracer_tpu.parallel import mesh as meshmod
    from unity_raytracer_tpu.parallel import shard as shardmod
    from unity_raytracer_tpu.parallel.bootstrap import maybe_initialize

    maybe_initialize()
    kw = {}
    if width:
        kw["width"] = width
    if height:
        kw["height"] = height
    scene, cam, cfg = get_preset(name, **kw)
    cfg = resolve_mode(scene, cfg.with_(
        kernel="xla" if jax.default_backend() == "cpu" else cfg.kernel))
    bvh = bvhmod.prepare_bvh(scene, cfg) if cfg.use_bvh else None

    devices = jax.devices()
    issued = count_rays(cfg.max_bounces, cam.width, cam.height,
                        int(np.asarray(scene.lights.valid).sum()))
    rows = []
    base = None
    for n in [c for c in counts if c <= len(devices)]:
        mesh = meshmod.make_mesh((n, 1), devices=devices[:n])
        c, t = _timed(lambda: shardmod.render_tiled(scene, cam, cfg,
                                                    mesh, bvh=bvh),
                      repeats)
        rps = issued / t
        if base is None:
            base = rps
        row = {"devices": n, "frame_s": t, "rays_per_s": rps,
               "efficiency": rps / (base * n), "compile_s": round(c, 2)}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
    return {"metric": f"scaling_efficiency_{name}",
            "value": rows[-1]["efficiency"] if rows else 0.0,
            "unit": "fraction",
            "vs_baseline": (rows[-1]["efficiency"] / 0.85) if rows else 0.0,
            "table": rows,
            "backend": jax.default_backend()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mesh100k")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-bvh", action="store_true")
    ap.add_argument("--no-grad", action="store_true")
    ap.add_argument("--kernel", default=None)
    ap.add_argument("--all", action="store_true",
                    help="also time the other presets (to stderr)")
    ap.add_argument("--sharded", action="store_true",
                    help="scaling table over device counts instead of "
                         "the flagship single-chip run")
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (scaling harness "
                         "without a pod slice)")
    args = ap.parse_args()
    if args.virtual:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()

    if args.sharded:
        preset = args.preset if args.preset != "mesh100k" or not \
            args.virtual else "mesh10k"
        out = run_sharded(preset, width=args.width, height=args.height,
                          repeats=max(1, args.repeats - 1))
        print(json.dumps(out))
        return

    if args.all:
        for p in ["three_spheres", "cornell_box", "mesh10k"]:
            try:
                r = run_once(p, repeats=max(1, args.repeats - 1),
                             grad=False)
                print(json.dumps(r), file=sys.stderr)
            except Exception as e:  # keep flagship result flowing
                print(f"[bench] {p} failed: {e}", file=sys.stderr)

    r = run_once(args.preset, width=args.width, height=args.height,
                 repeats=args.repeats, use_bvh=not args.no_bvh,
                 kernel=args.kernel, grad=not args.no_grad)
    print(json.dumps(r), file=sys.stderr)

    target = 1e9  # north-star rays/s/chip (BASELINE.md)
    out = {
        "metric": "rays_per_s_per_chip_fwd_1080p_d4_100k_bvh"
        if args.preset == "mesh100k" else f"rays_per_s_{args.preset}",
        "value": r["rays_per_s_fwd"],
        "unit": "rays/s",
        "vs_baseline": r["rays_per_s_fwd"] / target,
        "vs_baseline_live": (r["rays_per_s_live"] / target
                             if r["rays_per_s_live"] else None),
        "rays_per_s_fwd": r["rays_per_s_fwd"],
        "rays_per_s_fwd_bwd": r["rays_per_s_fwd_bwd"],
        "rays_per_s_fwd_bwd_composed": r["rays_per_s_fwd_bwd_composed"],
        "rays_per_s_fwd_bwd_soft": r["rays_per_s_fwd_bwd_soft"],
        "rays_per_s_live": r["rays_per_s_live"],
        "frame_s": r["frame_s"],
        "grad_s": r["grad_s"],
        "grad_composed_s": r["grad_composed_s"],
        "grad_soft_s": r["grad_soft_s"],
        "fraction_of_hbm_roofline": r["fraction_of_hbm_roofline"],
        "fraction_of_compute_roofline": r["fraction_of_compute_roofline"],
        "fraction_of_compute_roofline_fwd_bwd":
            r["fraction_of_compute_roofline_fwd_bwd"],
        "fraction_of_compute_roofline_fwd_bwd_soft":
            r["fraction_of_compute_roofline_fwd_bwd_soft"],
        "kernel": r["kernel"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
