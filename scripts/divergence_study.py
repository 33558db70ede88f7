"""Packet-divergence study (host-side, numpy): how many node visits does a
shared-cursor tile traversal pay vs the per-ray ideal, for primary / shadow /
bounce rays of the flagship mesh100k scene?

The mk3/mk4 kernels give every 1024-ray tile ONE cursor, so a tile visits the
UNION of its rays' node sets. This script simulates:

* ideal   — per-ray ordered (near-child-first) traversal, mean visits/ray
* union4  — mk4-style tile walk: ordered descent, shared stack, stale-pop
* union3  — mk3-style tile walk: threaded DFS order (miss links)

for several ray populations, and for two pixel->lane mappings (row-major vs
32x32 Morton blocks). Leaf and interior visits are counted separately since a
leaf visit costs ~10-30x an interior one (14 unrolled MT tests).

Run: python scripts/divergence_study.py  (CPU, ~1 min)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

TILE = 1024


def slab(o, inv, lo, hi, tmax):
    t1 = (lo - o) * inv
    t2 = (hi - o) * inv
    tn = np.minimum(t1, t2).max(axis=-1)
    tf = np.maximum(t1, t2).min(axis=-1)
    tn = np.maximum(tn, 0.0)
    return (tn <= tf) & (tn <= tmax), tn


class Pack:
    """Numpy view of the packed BVH (left=i+1, right from miss link)."""

    def __init__(self, bvh):
        self.nmin = np.asarray(bvh.node_min)
        self.nmax = np.asarray(bvh.node_max)
        self.first = np.asarray(bvh.first)
        self.count = np.asarray(bvh.count)
        self.miss = np.asarray(bvh.miss_next)
        self.tv = np.asarray(bvh.tri_verts)
        nn = self.first.shape[0]
        right = np.full(nn, -1, np.int64)
        interior = self.count == 0
        if nn > 1:
            right[interior] = self.miss[np.nonzero(interior)[0] + 1]
        self.right = right


def mt(o, d, tri):
    v0, v1, v2 = tri[0], tri[1], tri[2]
    e1, e2 = v1 - v0, v2 - v0
    h = np.cross(d, e2)
    a = (e1 * h).sum(-1)
    par = np.abs(a) < 1e-5
    f = 1.0 / np.where(par, 1.0, a)
    s = o - v0
    u = f * (s * h).sum(-1)
    q = np.cross(s, e1)
    v = f * (d * q).sum(-1)
    t = f * (e2 * q).sum(-1)
    miss = par | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) | (t <= 1e-5)
    return np.where(miss, np.inf, t)


def leaf_hit(pk, node, o, d, best_t):
    f0, c = pk.first[node], pk.count[node]
    for k in range(c):
        t = mt(o, d, pk.tv[f0 + k].transpose(1, 0)[:, :, None].transpose(
            0, 2, 1).squeeze(1) if False else pk.tv[f0 + k])
        # pk.tv[f0+k] is [3,3]; broadcast over rays:
        best_t = np.minimum(best_t, np.where(np.isfinite(t), t, np.inf))
    return best_t


def mt_batch(o, d, tri):
    """tri [3,3] vs rays [N,3] -> t [N]."""
    v0, v1, v2 = tri[0][None], tri[1][None], tri[2][None]
    e1, e2 = v1 - v0, v2 - v0
    h = np.cross(d, e2)
    a = (e1 * h).sum(-1)
    par = np.abs(a) < 1e-5
    f = 1.0 / np.where(par, 1.0, a)
    s = o - v0
    u = f * (s * h).sum(-1)
    q = np.cross(s, e1)
    v = f * (d * q).sum(-1)
    t = f * (e2 * q).sum(-1)
    miss = par | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) | (t <= 1e-5)
    return np.where(miss, np.inf, t)


def union_walk_ordered(pk, o, d, tmax, any_hit=False):
    """mk4: shared cursor + stack, near-child-first, stale-pop pruning."""
    inv = 1.0 / np.where(np.abs(d) < 1e-30, np.where(d < 0, -1e-30, 1e-30), d)
    best = tmax.copy()
    stack = []
    cursor = 0
    inter = leaf = 0
    while cursor >= 0:
        hit, _ = slab(o, inv, pk.nmin[cursor], pk.nmax[cursor], best)
        if pk.count[cursor] > 0:
            leaf += 1
            if hit.any():
                f0, c = pk.first[cursor], pk.count[cursor]
                for k in range(c):
                    t = mt_batch(o, d, pk.tv[f0 + k])
                    upd = (t < best) & hit
                    if any_hit:
                        best = np.where(upd, -1.0, best)
                    else:
                        best = np.where(upd, t, best)
            nxt = -1
        else:
            inter += 1
            if hit.any():
                l, r = cursor + 1, pk.right[cursor]
                hl, tnl = slab(o, inv, pk.nmin[l], pk.nmax[l], best)
                hr, tnr = slab(o, inv, pk.nmin[r], pk.nmax[r], best)
                inter += 2  # child pretests
                al, ar = hl.any(), hr.any()
                if al and ar:
                    ml = np.where(hl, tnl, np.inf).min()
                    mr = np.where(hr, tnr, np.inf).min()
                    near, far = (l, r) if ml <= mr else (r, l)
                    stack.append((far, min(ml, mr)))
                    nxt = near
                elif al:
                    nxt = l
                elif ar:
                    nxt = r
                else:
                    nxt = -1
            else:
                nxt = -1
        if any_hit and not (best > 0).any():
            break
        cur_max = best.max()
        while nxt < 0 and stack:
            nd, tn = stack.pop()
            if tn <= cur_max:
                nxt = nd
        cursor = nxt if nxt >= 0 else -1
    return inter, leaf, best


def union_walk_threaded(pk, o, d, tmax):
    """mk3: threaded order (descend or miss-link)."""
    inv = 1.0 / np.where(np.abs(d) < 1e-30, np.where(d < 0, -1e-30, 1e-30), d)
    best = tmax.copy()
    cursor = 0
    inter = leaf = 0
    while cursor >= 0:
        hit, _ = slab(o, inv, pk.nmin[cursor], pk.nmax[cursor], best)
        if pk.count[cursor] > 0:
            leaf += 1
            if hit.any():
                f0, c = pk.first[cursor], pk.count[cursor]
                for k in range(c):
                    t = mt_batch(o, d, pk.tv[f0 + k])
                    best = np.where((t < best) & hit, t, best)
            cursor = pk.miss[cursor]
        else:
            inter += 1
            cursor = cursor + 1 if hit.any() else pk.miss[cursor]
    return inter, leaf, best


def per_ray_ideal(pk, o, d, tmax):
    """Per-ray ordered traversal: mean interior/leaf visits per ray."""
    n = o.shape[0]
    tot_i = tot_l = 0
    best_out = np.empty(n)
    for i in range(n):
        ii, ll, b = union_walk_ordered(pk, o[i:i + 1], d[i:i + 1],
                                       tmax[i:i + 1])
        tot_i += ii
        tot_l += ll
        best_out[i] = b[0]
    return tot_i / n, tot_l / n, best_out


def block_order(w, h, bs=32):
    """Pixel index remap: row-major -> bs x bs blocks (block-row-major)."""
    ys, xs = np.mgrid[0:h, 0:w]
    key = ((ys // bs) * (w // bs + 1) + (xs // bs)) * (bs * bs) \
        + (ys % bs) * bs + (xs % bs)
    return np.argsort(key.ravel(), kind="stable")


def main():
    from unity_raytracer_tpu.models.camera import generate_rays
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.bvh import build
    from unity_raytracer_tpu.ops.pallas.traverse_mk3 import PALLAS_LEAF

    scene, cam, cfg = mesh100k()
    t0 = time.time()
    bvh = build(np.asarray(scene.meshes.verts), np.asarray(scene.meshes.valid),
                leaf_size=PALLAS_LEAF)
    print(f"bvh build {time.time()-t0:.2f}s nodes={bvh.n_nodes}")
    pk = Pack(bvh)

    o, d = generate_rays(cam)
    o = np.asarray(o)
    d = np.asarray(d)
    n = o.shape[0]
    rng = np.random.default_rng(0)

    def study(name, oo, dd, tmax, tiles=6, ideal_sample=64):
        print(f"\n== {name} ==")
        picks = rng.choice(oo.shape[0] // TILE, size=tiles, replace=False)
        ui = ul = ti = tl = 0
        besties = []
        for p in picks:
            s = slice(p * TILE, (p + 1) * TILE)
            i4, l4, _ = union_walk_ordered(pk, oo[s], dd[s], tmax[s])
            i3, l3, _ = union_walk_threaded(pk, oo[s], dd[s], tmax[s])
            ui += i4
            ul += l4
            ti += i3
            tl += l3
        idx = rng.choice(oo.shape[0], size=ideal_sample, replace=False)
        pi, plf, _ = per_ray_ideal(pk, oo[idx], dd[idx], tmax[idx])
        print(f"  mk4 union/tile: interior={ui/tiles:8.1f} leaf={ul/tiles:7.1f}"
              f"   mk3: interior={ti/tiles:8.1f} leaf={tl/tiles:7.1f}")
        print(f"  per-ray ideal : interior={pi:8.1f} leaf={plf:7.1f}"
              f"  (x1024 = {pi*1024:8.0f} / {plf*1024:7.0f})")
        print(f"  union overhead vs ideal-sum/1024: "
              f"int {ui/tiles/max(pi,1e-9):5.2f}x-of-mean "
              f"leaf {ul/tiles/max(plf,1e-9):5.2f}x-of-mean")

    # 1. primary rays, row-major lanes
    tmax0 = np.full(n, 3e38, np.float32)
    study("primary row-major", o, d, tmax0)

    # 2. primary rays, 32x32 blocks
    perm = block_order(cam.width, cam.height, 32)
    study("primary 32x32-block", o[perm], d[perm], tmax0)

    # 3. shadow rays from first hits toward light 0 (light-major slice)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from unity_raytracer_tpu.ops.bvh import traverse
    t1, _, _ = traverse(bvh, o, d)
    t1 = np.asarray(t1)
    hitm = np.isfinite(t1)
    p = o + d * np.where(hitm, t1, 1.0)[:, None]
    lpos = np.asarray(scene.lights.positions)[0]
    lvec = lpos[None] - p
    ldist = np.linalg.norm(lvec, axis=-1)
    ldir = lvec / ldist[:, None]
    so = p + 1e-4 * ldir
    stmax = np.where(hitm, ldist, -1.0).astype(np.float32)
    live = stmax > 0
    study("shadow L0 row-major", so, ldir, stmax)
    study("shadow L0 32x32-block", so[perm], ldir[perm], stmax[perm])

    # 4. sorted-by-direction-octant shadow rays (compacted live lanes)
    keys = ((ldir[:, 0] > 0).astype(int) * 4 + (ldir[:, 1] > 0).astype(int) * 2
            + (ldir[:, 2] > 0).astype(int))
    keys = np.where(live, keys, 8)
    sperm = np.argsort(keys, kind="stable")
    study("shadow L0 octant-sorted", so[sperm], ldir[sperm], stmax[sperm])

    # 5. reflected rays (mirror sphere only -> few live, compacted)
    from unity_raytracer_tpu.ops.intersect import nearest_hit, KIND_SPHERE
    hit = nearest_hit(scene, o, d, bvh=bvh, kernel="xla")
    kindv = np.asarray(hit.kind)
    is_mir = kindv == KIND_SPHERE
    print(f"\nmirror-hit lanes: {is_mir.sum()} / {n}"
          f" ({100*is_mir.mean():.2f}%)  -> live tiles if compacted:"
          f" {int(np.ceil(is_mir.sum()/TILE))} vs spread over"
          f" {len(np.unique(np.nonzero(is_mir)[0]//TILE))} row-major tiles")


if __name__ == "__main__":
    main()
