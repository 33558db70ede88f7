"""Round-5 tree-quality + step-count modeling (VERDICT r4 next-step #1).

Re-runs the r4 full-frame union-walk simulation (scripts/roofline_r4.py
— the exact megakernel walk discipline in numpy) over CANDIDATE trees
before burning TPU time:

* SAH bin sweep: 16 (shipped) / 32 / 64 bins at leaf 98
* fatter leaves: 140 / 196 (the leaf-98 lesson says step overhead
  binds, so fewer+fatter steps may keep winning past the flat 98-112
  region)

and collects the two step-count statistics the r5 kernel levers need:

* per-tile per-light shadow walk STEP counts, reported as sum vs max
  across lights — the modeled iteration saving of the batched
  per-light walk (cfg.shadow_batch: one while_loop advancing all L
  walks, overhead paid max(steps) instead of sum(steps) times);
* segment-1 live-lane density inside live tiles — the honest input to
  the threshold-compaction question (VERDICT r4 weak #1): if live
  lanes are already dense in few tiles, lane compaction can only merge
  tiles, bounding its possible win.

Run: python scripts/roofline_r5.py [out.json]   (CPU, ~5 min/tree)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # never claim the TPU chip

from roofline_r4 import WideWalker, mt_rows  # noqa: E402  (same dir)

TILE = 2048
VPU_EFF = 2.12e12    # measured counted-ops/s (r4 on-chip ubench)

F_SLAB = 28
F_INTERIOR = 4 * F_SLAB
F_MT_NEAR = 86
F_MT_SHADOW = 66
F_BW_NEAR = 46
F_BW_SHADOW = 42


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/roofline_r5.json"
    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod

    scene, cam, cfg0 = mesh100k()
    cfg0 = cfg0.with_(use_bvh=True, kernel="mega")

    o, d = generate_rays_blocks(cam, cfg0.block_size)
    o = np.asarray(o)
    d = np.asarray(d)
    n = o.shape[0]
    n_pix = cam.width * cam.height
    n_tiles = (n + TILE - 1) // TILE
    lights_p = np.asarray(scene.lights.positions)
    L = int(np.asarray(scene.lights.valid).sum())

    sph_c = np.asarray(scene.spheres.centers)
    sph_r2 = np.asarray(scene.spheres.radius_sq)
    sph_valid = np.asarray(scene.spheres.valid)
    tri_v = np.asarray(scene.triangles.verts)
    tri_valid = np.asarray(scene.triangles.valid)
    tri_n = np.asarray(scene.triangles.normals)

    candidates = [
        {"leaf": 98, "bins": 16},    # shipped r4 baseline
        {"leaf": 98, "bins": 32},
        {"leaf": 98, "bins": 64},
        {"leaf": 140, "bins": 16},
        {"leaf": 196, "bins": 16},
        # r5b: SBVH-style spatial presplitting (VERDICT r4 ask #1a) on
        # top of the shipped bins64 tree
        {"leaf": 98, "bins": 64, "presplit": 0.3},
        {"leaf": 98, "bins": 64, "presplit": 1.0},
    ]
    only = sys.argv[2] if len(sys.argv) > 2 else None

    results = {}
    for cand in candidates:
        leaf, bins = cand["leaf"], cand["bins"]
        ps = cand.get("presplit", 0.0)
        name = f"leaf{leaf}_bins{bins}" + (f"_ps{ps}" if ps else "")
        if only and only not in name:
            continue
        t0 = time.time()
        packed = bvhmod.prepare_bvh(
            scene, cfg0.with_(bvh_leaf=leaf, bvh_bins=bins,
                              bvh_presplit=ps))
        wk = WideWalker(packed)
        build_s = time.time() - t0

        picks = np.arange(n_tiles - 1)
        stats = dict(int0=0, leaf0=0, int_sh=0, leaf_sh=0,
                     sh_steps_sum=0.0, sh_steps_max=0.0)
        live1 = []   # (so, rd, tmax, live_count, live_mask)

        for p in picks:
            s = slice(p * TILE, (p + 1) * TILE)
            oo, ddr = o[s], d[s]
            tmax0 = np.full(TILE, 3e38)
            ni, nl, best, winrow = wk.walk(oo, ddr, tmax0,
                                           want_winner=True)
            stats["int0"] += ni
            stats["leaf0"] += nl

            # fold spheres + loose (winner kind/normal for shadows)
            bt = np.where(np.isfinite(best) & (best < 3e37), best,
                          np.inf)
            kind = np.where(winrow >= 0, 2, -1)
            nrm = np.zeros((TILE, 3))
            tv = np.asarray(packed.bvh.tri_verts)
            lp = np.asarray(packed.leaf_prim)
            wr = np.clip(winrow, 0, None)
            orig = np.where(winrow >= 0, lp[wr // 14, wr % 14], -1)
            tri = tv[np.clip(orig, 0, None)]
            nm = -np.cross(tri[:, 2] - tri[:, 0], tri[:, 1] - tri[:, 0])
            nm /= np.maximum(
                np.linalg.norm(nm, axis=-1, keepdims=True), 1e-30)
            nrm = nm
            for si in range(len(sph_valid)):
                if not sph_valid[si]:
                    continue
                oc = oo - sph_c[si]
                uoc = (ddr * oc).sum(-1)
                disc = uoc ** 2 - ((oc ** 2).sum(-1) - sph_r2[si])
                sq = np.sqrt(np.maximum(disc, 0))
                big, small = -uoc + sq, -uoc - sq
                ts = np.where(small < 0, big, small)
                ok = (disc >= 0) & (big >= 0)
                upd = ok & (ts < bt)
                bt = np.where(upd, ts, bt)
                kind = np.where(upd, 0, kind)
                pp = oo + ddr * ts[:, None]
                sn = (pp - sph_c[si]) / np.sqrt(sph_r2[si])
                nrm = np.where(upd[:, None], sn, nrm)
            for ti in range(len(tri_valid)):
                if not tri_valid[ti]:
                    continue
                tt = mt_rows(tri_v[ti].reshape(1, 9), oo, ddr)[:, 0]
                upd = tt < bt
                bt = np.where(upd, tt, bt)
                kind = np.where(upd, 1, kind)
                nrm = np.where(upd[:, None], tri_n[ti][None], nrm)

            hit = np.isfinite(bt)
            psurf = oo + ddr * np.where(hit, bt, 1.0)[:, None]
            so = psurf + nrm * 1e-4

            is_mir = hit & (kind == 0)
            if is_mir.sum() > 0:
                ddn = (ddr * nrm).sum(-1, keepdims=True)
                rd = ddr - 2 * nrm * ddn
                live1.append((so.copy(), rd,
                              np.where(is_mir, 3e38, -1.0),
                              int(is_mir.sum()), is_mir.copy()))

            per_light_steps = []
            for li in range(L):
                lvec = lights_p[li][None] - psurf
                ld = np.linalg.norm(lvec, axis=-1)
                ldir = lvec / np.maximum(ld, 1e-30)[:, None]
                ln = (ldir * nrm).sum(-1)
                need = hit & (ln >= 0)
                tm = np.where(need, ld, -1.0)
                ni, nl, _, _ = wk.walk(so, ldir, tm, any_hit=True)
                stats["int_sh"] += ni
                stats["leaf_sh"] += nl
                per_light_steps.append(ni + nl)
            stats["sh_steps_sum"] += sum(per_light_steps)
            stats["sh_steps_max"] += max(per_light_steps)

        # segment 1 (+ its shadows) over the live tiles
        seg1 = dict(int=0, leaf=0, tiles=len(live1), live=0,
                    live_in_tiles=0)
        for so1, rd1, tm1, cnt, mask in live1:
            ni, nl, best1, _ = wk.walk(so1, rd1, tm1, want_winner=True)
            seg1["int"] += ni
            seg1["leaf"] += nl
            seg1["live"] += cnt
            seg1["live_in_tiles"] += int(mask.sum())
            hit1 = np.isfinite(best1) & (best1 < 3e37) & (tm1 > 0)
            p1 = so1 + rd1 * np.where(hit1, best1, 1.0)[:, None]
            for li in range(L):
                lvec = lights_p[li][None] - p1
                ld = np.linalg.norm(lvec, axis=-1)
                ldir = lvec / np.maximum(ld, 1e-30)[:, None]
                tm = np.where(hit1, ld, -1.0)
                ni, nl, _, _ = wk.walk(p1 + 1e-4 * ldir, ldir, tm,
                                       any_hit=True)
                seg1["int"] += ni
                seg1["leaf"] += nl

        tiles = len(picks)
        leaf_slots = packed.rows_per_leaf * 14
        f_near_bw = F_BW_NEAR * (-(-leaf_slots // 10) * 10)
        f_sh_bw = F_BW_SHADOW * (-(-leaf_slots // 10) * 10)

        def gflop(n_int, n_leaf, f_leaf, tiles_used, scale_tiles):
            per_tile = (n_int * F_INTERIOR + n_leaf * f_leaf) * TILE
            return per_tile / max(tiles_used, 1) * scale_tiles / 1e9

        live_tiles = max(seg1["tiles"], 1)
        g_near = gflop(stats["int0"], stats["leaf0"], f_near_bw, tiles,
                       n_tiles)
        g_sh = gflop(stats["int_sh"], stats["leaf_sh"], f_sh_bw, tiles,
                     n_tiles)
        g_seg1 = gflop(seg1["int"], seg1["leaf"], f_sh_bw, live_tiles,
                       live_tiles)
        g_shade = 2.0
        g_total = g_near + g_sh + g_seg1 + g_shade
        issued = n_pix * 5 * (1 + L)
        bound = issued / (g_total * 1e9 / VPU_EFF)

        # step-count accounting (the overhead side of the model)
        steps_near = (stats["int0"] + stats["leaf0"]) / tiles
        steps_sh_sum = stats["sh_steps_sum"] / tiles
        steps_sh_max = stats["sh_steps_max"] / tiles
        seg1_steps = (seg1["int"] + seg1["leaf"]) / live_tiles

        row = {
            **cand,
            "build_s": round(build_s, 2),
            "wide_nodes": int(np.asarray(packed.wide).shape[0]),
            "gflop": {"nearest": g_near, "shadows": g_sh,
                      "seg1": g_seg1, "shade": g_shade,
                      "total_bw": g_total},
            "bound_rays_per_s_bw": bound,
            "steps_per_tile": {
                "nearest": steps_near,
                "shadows_sum": steps_sh_sum,
                "shadows_max": steps_sh_max,
                "batch_step_saving_frac":
                    1.0 - steps_sh_max / max(steps_sh_sum, 1e-9),
                "seg1": seg1_steps,
            },
            "seg1_density": {
                "live_tiles": seg1["tiles"],
                "live_lanes": seg1["live"],
                "density_in_live_tiles":
                    seg1["live_in_tiles"] / max(seg1["tiles"] * TILE, 1),
            },
        }
        results[name] = row
        print(json.dumps(row), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
