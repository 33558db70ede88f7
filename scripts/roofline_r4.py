"""Round-4 roofline re-derivation for the SHIPPED tree (leaf-56, arity-4
wide collapse) — replaces the stale leaf-14 model behind bench.py's
`compute_bound` (VERDICT r3 weak #1).

Host-side numpy replica of the megakernel's wide union walks:

* nearest walk  — ordered wide expansion, per-lane best_t cull,
  stale-pop prune (mega.near_body_wide semantics)
* shadow walks  — per-light any-hit walks (fuse_shadows=False shipped
  config), occ_mode='sort'
* segment-1     — mirror-continuation rays of the live tiles

over sampled 2048-lane tiles of the flagship 1080p frame, multiplied
out to per-frame FLOP totals against the measured ~1.5 TF/s f32 VPU
rate. Also models the two candidate levers BEFORE burning TPU time:

* light_cull τ  — drop shadow lanes whose conservative contribution
  bound (max(kd)+max(ks)) * max(I) / d^2 < τ (0-255 radiance units;
  1.0 = one 8-bit display step): culled fraction + union shrink
* tri_isect bw  — Baldwin–Weber precomputed-plane triangle test
  (~46 flop/tri vs Möller–Trumbore-from-verts ~86 in the nearest
  walk): same unions, cheaper leaf visits

Run: python scripts/roofline_r4.py [out.json]  (CPU, a few minutes)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # never claim the TPU chip

TILE = 2048          # shipped tile_r
VPU_F32 = 1.5e12     # measured f32 VPU rate on the v5e chip (r2 ubench)

# per-lane flop model (counted off the kernel bodies, docs/KERNELS.md)
F_SLAB = 28                  # one ray-box slab test
F_INTERIOR = 4 * F_SLAB      # arity-4 wide expand
F_MT_NEAR = 86               # MT from raw verts + tri_normal + selects
F_MT_SHADOW = 66             # MT + occlusion select
F_BW_NEAR = 46               # Baldwin-Weber + stored normal + selects
F_BW_SHADOW = 42


def mt_rows(tri9, o, d):
    """Batched Möller–Trumbore: tri9 [K,9] vs rays [n,3] -> t [n,K]."""
    v0 = tri9[:, 0:3][None]          # [1,K,3]
    e1 = tri9[:, 3:6][None] - v0
    e2 = tri9[:, 6:9][None] - v0
    dN = d[:, None, :]
    oN = o[:, None, :]
    h = np.cross(dN, e2)
    a = (e1 * h).sum(-1)
    par = np.abs(a) < 1e-5
    f = 1.0 / np.where(par, 1.0, a)
    s = oN - v0
    u = f * (s * h).sum(-1)
    q = np.cross(s, e1)
    v = f * (dN * q).sum(-1)
    t = f * (e2 * q).sum(-1)
    miss = par | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) | (t <= 1e-5)
    return np.where(miss, np.inf, t)


class WideWalker:
    """Union walk over the wide (arity-wide) node rows, exactly the
    megakernel's discipline: shared cursor + stack, ordered pushes,
    stale-pop prune, per-lane best cull."""

    def __init__(self, packed):
        self.wide = np.asarray(packed.wide)
        self.tris = np.asarray(packed.tris)
        self.rpl = packed.rows_per_leaf
        self.arity = self.wide.shape[1] // 8
        # leaf tri cache: tris row group -> [K,9]
        self._leafcache = {}

    def leaf9(self, row0):
        out = self._leafcache.get(row0)
        if out is None:
            K = self.rpl * 14
            out = np.zeros((K, 9), np.float32)
            for j in range(K):
                rr, kk = divmod(j, 14)
                out[j] = self.tris[row0 + rr, 9 * kk: 9 * kk + 9]
            self._leafcache[row0] = out
        return out

    def walk(self, o, d, tmax, any_hit=False, want_winner=False):
        """Returns (interior_visits, leaf_visits, best_t, winner_row)."""
        n = o.shape[0]
        tiny = 1e-30
        dd = np.where(np.abs(d) < tiny, np.where(d < 0, -tiny, tiny), d)
        inv = 1.0 / dd
        best = tmax.astype(np.float64).copy()
        winner = np.full(n, -1, np.int64)
        stack = []           # (enc, key), top = end
        cursor = 0           # wide row 0
        n_int = n_leaf = 0
        while True:
            if cursor < -1:       # leaf entry
                n_leaf += 1
                row0 = -cursor - 2
                tri9 = self.leaf9(row0)
                t = mt_rows(tri9, o, d)       # [n,K]
                if any_hit:
                    occ = (t < best[:, None]).any(axis=1)
                    best = np.where(occ, -1.0, best)
                else:
                    tmin = t.min(axis=1)
                    upd = tmin < best
                    best = np.where(upd, tmin, best)
                    if want_winner:
                        kk = t.argmin(axis=1)
                        winner = np.where(upd, row0 * 14 + kk, winner)
            else:                 # interior entry: expand children
                n_int += 1
                row = self.wide[cursor]
                kids = []
                for c in range(self.arity):
                    b = 8 * c
                    cnt = row[b + 7]
                    if cnt < 0:
                        continue
                    lo = row[b:b + 3]
                    hi = row[b + 3:b + 6]
                    t1 = (lo[None] - o) * inv
                    t2 = (hi[None] - o) * inv
                    tn = np.minimum(t1, t2).max(axis=-1)
                    tf = np.maximum(t1, t2).min(axis=-1)
                    tn = np.maximum(tn, 0.0)
                    hit = (tn <= tf) & (tn <= best)
                    if hit.any():
                        key = np.where(hit, tn, np.inf).min()
                        meta = int(row[b + 6])
                        enc = -(meta + 2) if cnt > 0 else meta
                        kids.append((enc, key))
                kids.sort(key=lambda x: x[1], reverse=True)  # far-to-near
                stack.extend(kids)
            if any_hit and not (best > 0).any():
                break
            cur_max = best.max()
            cursor = None
            while stack:
                enc, key = stack.pop()
                if key <= cur_max:
                    cursor = enc
                    break
            if cursor is None:
                break
        return n_int, n_leaf, best, winner


def build_packed(scene, cfg, leaf):
    from unity_raytracer_tpu.ops import bvh as bvhmod
    return bvhmod.prepare_bvh(scene, cfg.with_(bvh_leaf=leaf))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/roofline_r4.json"
    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k

    scene, cam, cfg0 = mesh100k()
    cfg0 = cfg0.with_(use_bvh=True, kernel="mega")
    rng = np.random.default_rng(0)

    o, d = generate_rays_blocks(cam, cfg0.block_size)
    o = np.asarray(o)
    d = np.asarray(d)
    n = o.shape[0]                        # padded to whole pixel blocks
    n_pix = cam.width * cam.height        # issued accounting uses pixels
    n_tiles = (n + TILE - 1) // TILE
    lights_p = np.asarray(scene.lights.positions)
    lights_i = np.asarray(scene.lights.intensities)
    L = int(np.asarray(scene.lights.valid).sum())

    # scene-level material bound helpers (sphere / loose / mesh tables)
    sph_c = np.asarray(scene.spheres.centers)
    sph_r2 = np.asarray(scene.spheres.radius_sq)
    sph_valid = np.asarray(scene.spheres.valid)
    tri_v = np.asarray(scene.triangles.verts)
    tri_valid = np.asarray(scene.triangles.valid)
    tri_n = np.asarray(scene.triangles.normals)
    mesh_id = np.asarray(scene.meshes.mesh_id)

    def mat_bound(kind, idx, mesh_i):
        """max(kd)+max(ks) per lane for the cull model."""
        def mx(m):
            return (np.asarray(m.diffuse).max(axis=-1)
                    + np.asarray(m.specular).max(axis=-1))
        s = mx(scene.spheres.materials)
        t = mx(scene.triangles.materials)
        k = mx(scene.meshes.mesh_materials)
        out = np.zeros(idx.shape, np.float64)
        out = np.where(kind == 0, s[np.clip(idx, 0, len(s) - 1)], out)
        out = np.where(kind == 1, t[np.clip(idx, 0, len(t) - 1)], out)
        out = np.where(kind == 2, k[np.clip(mesh_i, 0, len(k) - 1)], out)
        return out

    results = {}
    for leaf in (56, 98):
        t0 = time.time()
        packed = build_packed(scene, cfg0, leaf)
        wk = WideWalker(packed)
        prim_index = np.asarray(packed.bvh.prim_index)
        tv = np.asarray(packed.bvh.tri_verts)
        build_s = time.time() - t0

        # every full tile: most are ground/background tiles whose walks
        # terminate in a few steps (the BVH holds only mesh triangles);
        # the mesh-covering minority carries the cost, so uniform small
        # samples are hopelessly noisy (first cut of this script)
        picks = np.arange(n_tiles - 1)
        stats = dict(int0=0, leaf0=0, int_sh=0, leaf_sh=0,
                     sh_lanes=0, lanes=0,
                     cull={}, int_sh_cull={}, leaf_sh_cull={})
        taus = (0.5, 1.0, 2.0, 4.0)
        walk_taus = (2.0, 4.0)   # union recount only for these
        for tau in taus:
            stats["cull"][tau] = 0
        for tau in walk_taus:
            stats["int_sh_cull"][tau] = 0
            stats["leaf_sh_cull"][tau] = 0
        live1_tiles = []

        for p in picks:
            s = slice(p * TILE, (p + 1) * TILE)
            oo, ddr = o[s], d[s]
            tmax0 = np.full(TILE, 3e38)
            ni, nl, best, winrow = wk.walk(oo, ddr, tmax0,
                                           want_winner=True)
            stats["int0"] += ni
            stats["leaf0"] += nl
            stats["lanes"] += TILE

            # fold in spheres + loose tris (numpy brute, tiny counts)
            kind = np.where(winrow >= 0, 2, -1)   # 2=mesh,0=sphere,1=tri
            widx = np.zeros(TILE, np.int64)
            # winner row -> original prim -> mesh id (leaf_prim mapping)
            lp = np.asarray(packed.leaf_prim)
            wr = np.clip(winrow, 0, None)
            leafrow = wr // 14
            slot = wr % 14
            orig = np.where(winrow >= 0, lp[leafrow, slot], -1)
            mesh_i = np.where(orig >= 0,
                              mesh_id[prim_index[np.clip(orig, 0, None)]],
                              0)
            # winner normal (mesh): -normalize(cross(v2-v0, v1-v0))
            tri = tv[np.clip(orig, 0, None)]
            e1 = tri[:, 2] - tri[:, 0]
            e2 = tri[:, 1] - tri[:, 0]
            nm = -np.cross(e1, e2)
            nm /= np.maximum(np.linalg.norm(nm, axis=-1, keepdims=True),
                             1e-30)
            nrm = nm
            bt = np.where(np.isfinite(best) & (best < 3e37), best, np.inf)

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
                widx = np.where(upd, si, widx)
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
                widx = np.where(upd, ti, widx)
                nrm = np.where(upd[:, None], tri_n[ti][None], nrm)

            hit = np.isfinite(bt)
            psurf = oo + ddr * np.where(hit, bt, 1.0)[:, None]
            so = psurf + nrm * 1e-4
            kd_ks = mat_bound(kind, widx, mesh_i)

            # mirror continuation lanes (sphere 0 is the mirror)
            is_mir = hit & (kind == 0)
            if is_mir.sum() > 0:
                ddn = (ddr * nrm).sum(-1, keepdims=True)
                rd = ddr - 2 * nrm * ddn
                live1_tiles.append(
                    (so.copy(), rd, np.where(is_mir, 3e38, -1.0),
                     int(is_mir.sum())))

            for li in range(L):
                lvec = lights_p[li][None] - psurf
                ld = np.linalg.norm(lvec, axis=-1)
                ldir = lvec / np.maximum(ld, 1e-30)[:, None]
                ln = (ldir * nrm).sum(-1)
                need = hit & (ln >= 0)
                stats["sh_lanes"] += int(need.sum())
                tm = np.where(need, ld, -1.0)
                ni, nl, _, _ = wk.walk(so, ldir, tm, any_hit=True)
                stats["int_sh"] += ni
                stats["leaf_sh"] += nl
                contrib = kd_ks * lights_i[li].max() / np.maximum(
                    ld ** 2, 1e-9)
                for tau in taus:
                    needc = need & (contrib >= tau)
                    stats["cull"][tau] += int((need & ~needc).sum())
                    if tau in walk_taus:
                        tmc = np.where(needc, ld, -1.0)
                        ni2, nl2, _, _ = wk.walk(so, ldir, tmc,
                                                 any_hit=True)
                        stats["int_sh_cull"][tau] += ni2
                        stats["leaf_sh_cull"][tau] += nl2

        # ---- segment 1 (mirror bounce) on the live sampled tiles -------
        seg1 = dict(int=0, leaf=0, tiles=len(live1_tiles), live=0)
        for so1, rd1, tm1, cnt in live1_tiles:
            ni, nl, best1, win1 = wk.walk(so1, rd1, tm1, want_winner=True)
            seg1["int"] += ni
            seg1["leaf"] += nl
            seg1["live"] += cnt
            # shadows of the bounce segment: approximate need = hit lanes
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
        mirror_frac = (sum(t[3] for t in live1_tiles)
                       / max(stats["lanes"], 1))
        live_tiles_est = max(1, len(live1_tiles))  # exact: all tiles walked

        def gflop(n_int, n_leaf, f_leaf, tiles_used, scale_tiles):
            per_tile = (n_int * F_INTERIOR + n_leaf * f_leaf) * TILE
            return per_tile / max(tiles_used, 1) * scale_tiles / 1e9

        leaf_slots = packed.rows_per_leaf * 14
        f_near = F_MT_NEAR * leaf_slots
        f_sh = F_MT_SHADOW * leaf_slots
        f_near_bw = F_BW_NEAR * (-(-leaf_slots // 10) * 10)
        f_sh_bw = F_BW_SHADOW * (-(-leaf_slots // 10) * 10)

        g_near = gflop(stats["int0"], stats["leaf0"], f_near, tiles,
                       n_tiles)
        g_sh = gflop(stats["int_sh"], stats["leaf_sh"], f_sh, tiles,
                     n_tiles)
        g_seg1 = gflop(seg1["int"], seg1["leaf"], f_sh,
                       max(seg1["tiles"], 1), live_tiles_est)
        g_shade = 2.0  # spheres/loose prepass + material select + lighting
        g_total = g_near + g_sh + g_seg1 + g_shade

        g_near_bw = gflop(stats["int0"], stats["leaf0"], f_near_bw,
                          tiles, n_tiles)
        g_sh_bw = gflop(stats["int_sh"], stats["leaf_sh"], f_sh_bw,
                        tiles, n_tiles)
        g_seg1_bw = gflop(seg1["int"], seg1["leaf"], f_sh_bw,
                          max(seg1["tiles"], 1), live_tiles_est)
        g_total_bw = g_near_bw + g_sh_bw + g_seg1_bw + g_shade

        issued = n_pix * 5 * (1 + L)
        row = {
            "leaf": leaf, "build_s": round(build_s, 2),
            "wide_nodes": int(np.asarray(packed.wide).shape[0]),
            "tris_rows": int(np.asarray(packed.tris).shape[0]),
            "per_tile": {
                "int_nearest": stats["int0"] / tiles,
                "leaf_nearest": stats["leaf0"] / tiles,
                "int_shadow_perL": stats["int_sh"] / tiles / L,
                "leaf_shadow_perL": stats["leaf_sh"] / tiles / L,
            },
            "seg1": {"live_lane_frac": mirror_frac,
                     "live_tiles_est": live_tiles_est,
                     "int_per_tile": seg1["int"] / max(seg1["tiles"], 1),
                     "leaf_per_tile": seg1["leaf"] / max(seg1["tiles"], 1)},
            "gflop": {"nearest": g_near, "shadows": g_sh,
                      "seg1": g_seg1, "shade": g_shade,
                      "total": g_total, "total_bw": g_total_bw},
            "bound_rays_per_s": issued / (g_total * 1e9 / VPU_F32),
            "bound_rays_per_s_bw": issued / (g_total_bw * 1e9 / VPU_F32),
            "cull": {},
        }
        for tau in taus:
            culled = stats["cull"][tau] / max(stats["sh_lanes"], 1)
            row["cull"][str(tau)] = {"lane_frac_culled": culled}
            if tau in walk_taus:
                g_shc = gflop(stats["int_sh_cull"][tau],
                              stats["leaf_sh_cull"][tau], f_sh, tiles,
                              n_tiles)
                row["cull"][str(tau)].update({
                    "gflop_shadows": g_shc,
                    "bound_rays_per_s_cull": issued / (
                        (g_near + g_shc + g_seg1 + g_shade)
                        * 1e9 / VPU_F32),
                    "bound_rays_per_s_bw_cull": issued / (
                        (g_near_bw + g_shc * f_sh_bw / f_sh + g_seg1_bw
                         + g_shade) * 1e9 / VPU_F32),
                })
        results[f"leaf{leaf}"] = row
        print(json.dumps(row), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
