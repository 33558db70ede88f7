"""Fused bounce-segment megakernel (mk5): one Pallas launch per segment.

The composed path issues, per bounce segment, one nearest-hit traversal
launch + one L-light shadow launch and round-trips hit records, surface
attributes, and [N,L] lighting tensors through HBM/XLA between them. This
kernel fuses the ENTIRE segment per 1024-ray tile:

  nearest mesh hit (ordered packet traversal, traverse_mk4 order)
  + brute sphere / loose-triangle tests (reference combine order,
    Scene.IntersectRay, Data/Objects/Scene.cs:64-115)
  + scene-AABB mask (Scene.cs:54)
  + winning-primitive shading normal and material resolved IN the
    traversal loop (scalar per-slot data, masked vector updates — no
    per-lane dynamic gathers, which Mosaic cannot do)
  + per-light shadow occlusion via an embedded any-hit traversal over
    the same VMEM-resident BVH rows (threaded order — ordering buys
    nothing for any-hit) plus sphere/tri occluders
  + Blinn-Phong direct lighting (RayTracingSetup.cs:324-455 semantics,
    0-255 Rgb radiance scale)
  + mirror continuation (Reflect, :368-373)

All-dead tiles (every lane ``t_max < 0``) write pass-through outputs and
skip everything — the bounce chain's tail segments cost one predicate
per tile.

This is the HARD forward path only: temps must be 0 (no soft gradients)
and mode 'scan' (mirror chain). The differentiable path stays on the
composed kernels. Parity: bitwise vs the composed pallas path is NOT
guaranteed (different op order in shading sums); tests assert allclose.

Scene constants ride in a packed ``aux [rows,128]`` f32 block (static
row/lane indices -> immediate scalar loads):

  row 0:            aabb_min(0:3) aabb_max(3:6) ambient(6:9) bg(9:12)
  rows lights:      pos(0:3) intensity(3:6) valid(6)
  rows spheres:     center(0:3) r2(3) valid(4) matid(5)
  rows loose tris:  v0 v1 v2 (0:9) normal(9:12) valid(12) matid(13)
  rows materials:   diffuse(0:3) ambient(3:6) mirror(6:9) specular(9:12)
                    phong(12) is_mirror(13) transparency(14:17) ior(17)
                    is_dielectric(18)   [14:19 read only by fork mode]

Mesh-triangle material ids are packed per leaf slot in
``PackedBVH.leafmeta [n_leaves, 16]`` (prepare_bvh), and shading normals
are re-derived from the slot verts (canonical winding — bvh.shading_normal
convention), so the kernel needs no per-lane gathers at all.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unity_raytracer_tpu.ops.pallas.traverse_mk3 import (
    _BIG, BW_PER_ROW, EPS, PALLAS_LEAF, TILE_R, PackedBVH)
from unity_raytracer_tpu.ops.pallas.traverse_mk4 import STACK as STACK_BIN
from unity_raytracer_tpu.ops.pallas.traverse_wide import (
    _INF, STACK as STACK_WIDE, wide_expand as _wide_expand,
    wide_pop as _wide_pop)

SHADOW_EPS = 1e-4  # ShadowRayEpsilon, RayTracingSetup.cs:42


def _bw1(o3, d3, rec):
    """Baldwin–Weber test of one precomputed 12-float record (pack_bw
    layout: unit normal, plane offset, two affine barycentric rows)
    against a ray set -> (ok, t). Pad/degenerate records are all-zero
    and reject at the |n.d| gate."""
    sx, sy, sz = o3
    dx_, dy_, dz_ = d3
    nx, ny, nz, dh, ax, ay, az, a0, bx, by, bz, b0 = rec
    nd = nx * dx_ + ny * dy_ + nz * dz_
    par = jnp.abs(nd) < 1e-30
    t = (dh - (nx * sx + ny * sy + nz * sz)) / jnp.where(par, 1.0, nd)
    hx = sx + dx_ * t
    hy = sy + dy_ * t
    hz = sz + dz_ * t
    u = ax * hx + ay * hy + az * hz + a0
    v = bx * hx + by * hy + bz * hz + b0
    ok = ~par & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > EPS)
    return ok, t


def _unrolled(body, k: int):
    """Compose a wide-walk while body with itself ``k`` times: one loop
    iteration processes up to ``k`` stack entries, amortizing the
    per-iteration branch/bookkeeping overhead that dominates the
    measured step cost (docs/KERNELS.md). Safe because every wide body
    is a no-op at cursor == -1 (leaf test masked off, expansion masked
    off, pop of an empty stack returns -1 again)."""
    if k <= 1:
        return body

    def body_k(c):
        for _ in range(k):
            c = body(c)
        return c
    return body_k


def _occluded_fused(nodes_ref, tris_ref, aux_ref, rays,
                    n_lights, n_spheres, n_tris,
                    stack_ref, stack_tn_ref, arity, unroll=1,
                    occ_mode="sort", leaf_rows=1,
                    tri_isect="mt", bw_rows=0, min_mode=False):
    """Fused any-hit occlusion for ALL lights in ONE wide stack walk.

    ``rays``: per light ``(sx, sy, sz, ldx, ldy, ldz, tmax)`` with
    ``tmax`` the light distance (< 0 = lane needs no query). The
    per-light walks over one tile visit heavily overlapping node sets;
    fusing pays the per-step scalar-load/loop overhead ONCE for the
    union instead of once per light — the walk count per segment drops
    from 1+L to 2. Returns a list of per-light occlusion masks (same
    semantics as _occluded, including the scene-AABB gate).

    ``min_mode`` (soft-replay recording): occluders update the per-lane
    best to their true t instead of the -1 retire mark, so the walk
    returns the MIN occluder distance per light (no early lane retire —
    a nearest-style walk). Returns ``(masks, sts)`` with ``st`` the min
    occluder t, or _BIG when unoccluded / culled / out of the scene box.
    """
    L = len(rays)
    tiny = 1e-30
    fix = lambda v: jnp.where(jnp.abs(v) < tiny,
                              jnp.where(v < 0, -tiny, tiny), v)

    def slab1(o3, inv3, lx, ly, lz, hx, hy, hz, best):
        sx, sy, sz = o3
        ix, iy, iz = inv3
        t1 = (lx - sx) * ix
        t2 = (hx - sx) * ix
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2)
        t1 = (ly - sy) * iy
        t2 = (hy - sy) * iy
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        t1 = (lz - sz) * iz
        t2 = (hz - sz) * iz
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        tn = jnp.maximum(tn, 0.0)
        return (tn <= tf) & (tn <= best)

    def mt1(o3, d3, v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z):
        sx, sy, sz = o3
        dx_, dy_, dz_ = d3
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        px_ = dy_ * e2z - dz_ * e2y
        py_ = dz_ * e2x - dx_ * e2z
        pz_ = dx_ * e2y - dy_ * e2x
        det = e1x * px_ + e1y * py_ + e1z * pz_
        par = jnp.abs(det) < EPS
        f = 1.0 / jnp.where(par, 1.0, det)
        qx_, qy_, qz_ = sx - v0x, sy - v0y, sz - v0z
        u = f * (qx_ * px_ + qy_ * py_ + qz_ * pz_)
        cx_ = qy_ * e1z - qz_ * e1y
        cy_ = qz_ * e1x - qx_ * e1z
        cz_ = qx_ * e1y - qy_ * e1x
        v = f * (dx_ * cx_ + dy_ * cy_ + dz_ * cz_)
        t = f * (e2x * cx_ + e2y * cy_ + e2z * cz_)
        ok = (~par & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > EPS))
        return ok, t

    invs, bests, best0s = [], [], []
    for (sx, sy, sz, ldx, ldy, ldz, tmax) in rays:
        inv = (1.0 / fix(ldx), 1.0 / fix(ldy), 1.0 / fix(ldz))
        in_box = slab1((sx, sy, sz), inv,
                       aux_ref[0, 0], aux_ref[0, 1], aux_ref[0, 2],
                       aux_ref[0, 3], aux_ref[0, 4], aux_ref[0, 5],
                       jnp.full(sx.shape, _BIG, jnp.float32))
        best = jnp.where(in_box, tmax, -1.0)
        # spheres + loose tris prepass (cheap, retires lanes pre-walk)
        for s in range(n_spheres):
            r = 1 + n_lights + s
            ocx = sx - aux_ref[r, 0]
            ocy = sy - aux_ref[r, 1]
            ocz = sz - aux_ref[r, 2]
            r2 = aux_ref[r, 3]
            svalid = aux_ref[r, 4] > 0.0
            uoc = ldx * ocx + ldy * ocy + ldz * ocz
            oc2 = ocx * ocx + ocy * ocy + ocz * ocz
            disc = uoc * uoc - (oc2 - r2)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            big = -uoc + sq
            small = -uoc - sq
            t_s = jnp.where(small < 0.0, big, small)
            ok = (disc >= 0.0) & (big >= 0.0) & svalid
            best = jnp.where(ok & (t_s < best),
                             t_s if min_mode else -1.0, best)
        for tt in range(n_tris):
            r = 1 + n_lights + n_spheres + tt
            ok, t_t = mt1((sx, sy, sz), (ldx, ldy, ldz),
                          *tuple(aux_ref[r, j] for j in range(9)))
            ok = ok & (aux_ref[r, 12] > 0.0)
            best = jnp.where(ok & (t_t < best),
                             t_t if min_mode else -1.0, best)
        invs.append(inv)
        bests.append(best)
        best0s.append(jnp.where(in_box, tmax, -1.0))

    def body(c):
        cursor, sp, cur_max = c[0], c[1], c[2]
        bests = list(c[3:])
        is_leafe = cursor < -1
        leaf_row = jnp.maximum(-cursor - 2, 0)

        def leaf_tests(args):
            bests = list(args[:-1])
            if tri_isect == "bw":
                bwbase = (leaf_row // leaf_rows) * bw_rows
                for j in range(leaf_rows * PALLAS_LEAF):
                    row = bwbase + j // BW_PER_ROW
                    b = 12 * (j % BW_PER_ROW)
                    rec = tuple(tris_ref[row, b + q] for q in range(12))
                    for l in range(L):
                        sx, sy, sz, ldx, ldy, ldz, _ = rays[l]
                        ok, t = _bw1((sx, sy, sz), (ldx, ldy, ldz), rec)
                        bests[l] = jnp.where(ok & (t < bests[l]),
                                             t if min_mode else -1.0,
                                             bests[l])
            else:
                for rr, k in [(r_, k_) for r_ in range(leaf_rows)
                              for k_ in range(PALLAS_LEAF)]:
                    b = 9 * k
                    vs = tuple(tris_ref[leaf_row + rr, b + j]
                               for j in range(9))
                    for l in range(L):
                        sx, sy, sz, ldx, ldy, ldz, _ = rays[l]
                        ok, t = mt1((sx, sy, sz), (ldx, ldy, ldz), *vs)
                        bests[l] = jnp.where(ok & (t < bests[l]),
                                             t if min_mode else -1.0,
                                             bests[l])
            # ONE cross-lane reduction, on leaf steps only: elementwise
            # max across light sets, then max over lanes
            cur = jnp.max(functools.reduce(jnp.maximum, bests))
            return (*bests, cur)

        out = jax.lax.cond(is_leafe, leaf_tests, lambda a: a,
                           (*bests, cur_max))
        bests = list(out[:-1])
        cur_max = out[-1]
        node = jnp.maximum(cursor, 0)
        ray_sets = [(rays[l][0], rays[l][1], rays[l][2],
                     invs[l][0], invs[l][1], invs[l][2], bests[l])
                    for l in range(L)]
        sp = _wide_expand(nodes_ref, stack_ref, stack_tn_ref, node,
                          sp, cursor >= 0, ray_sets, arity,
                          ordered=occ_mode)
        cursor, sp = _wide_pop(stack_ref, stack_tn_ref, sp, cur_max)
        return (cursor, sp, cur_max, *bests)

    def cond(c):
        # scalar-only: cur_max <= 0 iff every lane of every set retired
        return (c[0] != -1) & (c[2] > 0.0)

    cur0 = jnp.max(functools.reduce(jnp.maximum, bests))
    out = jax.lax.while_loop(cond, _unrolled(body, unroll),
                             (jnp.int32(0), jnp.int32(0), cur0, *bests))
    bests = out[3:]
    if min_mode:
        # an unoccluded lane's best is untouched (== best0 exactly)
        masks = [(bests[l] < best0s[l]) & (best0s[l] > 0.0)
                 for l in range(L)]
        sts = [jnp.where(masks[l], bests[l], _BIG) for l in range(L)]
        return masks, sts
    return [(bests[l] < 0.0) & (best0s[l] > 0.0) for l in range(L)]


def _occluded_batch(nodes_ref, tris_ref, aux_ref, rays,
                    n_lights, n_spheres, n_tris,
                    stack_ref, stack_tn_ref, arity, unroll=1,
                    occ_mode="sort", leaf_rows=1,
                    tri_isect="mt", bw_rows=0, min_mode=False,
                    stack_cap=STACK_WIDE):
    """All L any-hit walks advanced in ONE while_loop with INDEPENDENT
    cursors / stacks / bests — NOT the shared-union fused walk.

    The motivation is the measured step economics (docs/KERNELS.md): the
    while_loop's per-iteration overhead (scalar loads, branch, loop
    bookkeeping) rivals its vector work, and L sequential per-light
    walks pay that overhead ``sum_l steps_l`` times. Advancing all L
    walks per iteration pays it ``max_l steps_l`` times instead — while
    each light still visits ONLY its own nodes, so the fat-leaf union
    blowup that makes the fused walk lose (a fused leaf visit tests
    leaf_size * L triangles) cannot occur: each leaf visit here tests
    one light's rays only. Finished walks no-op (masked expand, empty
    pop) and cost one wasted arity-slab of vector work per iteration.

    Each light's stack lives at offset ``l * stack_cap`` of the shared
    SMEM scratch (the caller sizes it ``n_lights * stack_cap``).
    Same semantics and returns as ``_occluded_fused``.
    """
    L = len(rays)
    tiny = 1e-30
    fix = lambda v: jnp.where(jnp.abs(v) < tiny,
                              jnp.where(v < 0, -tiny, tiny), v)

    def slab1(o3, inv3, lx, ly, lz, hx, hy, hz, best):
        sx, sy, sz = o3
        ix, iy, iz = inv3
        t1 = (lx - sx) * ix
        t2 = (hx - sx) * ix
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2)
        t1 = (ly - sy) * iy
        t2 = (hy - sy) * iy
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        t1 = (lz - sz) * iz
        t2 = (hz - sz) * iz
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        tn = jnp.maximum(tn, 0.0)
        return (tn <= tf) & (tn <= best)

    def mt1(o3, d3, v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z):
        sx, sy, sz = o3
        dx_, dy_, dz_ = d3
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        px_ = dy_ * e2z - dz_ * e2y
        py_ = dz_ * e2x - dx_ * e2z
        pz_ = dx_ * e2y - dy_ * e2x
        det = e1x * px_ + e1y * py_ + e1z * pz_
        par = jnp.abs(det) < EPS
        f = 1.0 / jnp.where(par, 1.0, det)
        qx_, qy_, qz_ = sx - v0x, sy - v0y, sz - v0z
        u = f * (qx_ * px_ + qy_ * py_ + qz_ * pz_)
        cx_ = qy_ * e1z - qz_ * e1y
        cy_ = qz_ * e1x - qx_ * e1z
        cz_ = qx_ * e1y - qy_ * e1x
        v = f * (dx_ * cx_ + dy_ * cy_ + dz_ * cz_)
        t = f * (e2x * cx_ + e2y * cy_ + e2z * cz_)
        ok = (~par & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > EPS))
        return ok, t

    # per-light prepass: scene box gate + sphere/loose occluders
    invs, bests, best0s = [], [], []
    for (sx, sy, sz, ldx, ldy, ldz, tmax) in rays:
        inv = (1.0 / fix(ldx), 1.0 / fix(ldy), 1.0 / fix(ldz))
        in_box = slab1((sx, sy, sz), inv,
                       aux_ref[0, 0], aux_ref[0, 1], aux_ref[0, 2],
                       aux_ref[0, 3], aux_ref[0, 4], aux_ref[0, 5],
                       jnp.full(sx.shape, _BIG, jnp.float32))
        best = jnp.where(in_box, tmax, -1.0)
        for s in range(n_spheres):
            r = 1 + n_lights + s
            ocx = sx - aux_ref[r, 0]
            ocy = sy - aux_ref[r, 1]
            ocz = sz - aux_ref[r, 2]
            r2 = aux_ref[r, 3]
            svalid = aux_ref[r, 4] > 0.0
            uoc = ldx * ocx + ldy * ocy + ldz * ocz
            oc2 = ocx * ocx + ocy * ocy + ocz * ocz
            disc = uoc * uoc - (oc2 - r2)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            big = -uoc + sq
            small = -uoc - sq
            t_s = jnp.where(small < 0.0, big, small)
            ok = (disc >= 0.0) & (big >= 0.0) & svalid
            best = jnp.where(ok & (t_s < best),
                             t_s if min_mode else -1.0, best)
        for tt in range(n_tris):
            r = 1 + n_lights + n_spheres + tt
            ok, t_t = mt1((sx, sy, sz), (ldx, ldy, ldz),
                          *tuple(aux_ref[r, j] for j in range(9)))
            ok = ok & (aux_ref[r, 12] > 0.0)
            best = jnp.where(ok & (t_t < best),
                             t_t if min_mode else -1.0, best)
        invs.append(inv)
        bests.append(best)
        best0s.append(jnp.where(in_box, tmax, -1.0))

    def leaf_tests_one(l, leaf_row, best):
        sx, sy, sz, ldx, ldy, ldz, _ = rays[l]
        if tri_isect == "bw":
            bwbase = (leaf_row // leaf_rows) * bw_rows
            for j in range(leaf_rows * PALLAS_LEAF):
                row = bwbase + j // BW_PER_ROW
                b = 12 * (j % BW_PER_ROW)
                rec = tuple(tris_ref[row, b + q] for q in range(12))
                ok, t = _bw1((sx, sy, sz), (ldx, ldy, ldz), rec)
                best = jnp.where(ok & (t < best),
                                 t if min_mode else -1.0, best)
            return best
        for rr, k in [(r_, k_) for r_ in range(leaf_rows)
                      for k_ in range(PALLAS_LEAF)]:
            b = 9 * k
            vs = tuple(tris_ref[leaf_row + rr, b + j] for j in range(9))
            ok, t = mt1((sx, sy, sz), (ldx, ldy, ldz), *vs)
            best = jnp.where(ok & (t < best),
                             t if min_mode else -1.0, best)
        return best

    def body(c):
        cursors = list(c[0:L])
        sps = list(c[L:2 * L])
        cur_maxes = list(c[2 * L:3 * L])
        bests = list(c[3 * L:4 * L])
        for l in range(L):
            cursor, sp, cur_max, best = (cursors[l], sps[l],
                                         cur_maxes[l], bests[l])
            is_leafe = cursor < -1
            leaf_row = jnp.maximum(-cursor - 2, 0)

            def leaf_branch(args, l=l, leaf_row=leaf_row):
                b2 = leaf_tests_one(l, leaf_row, args[0])
                return b2, jnp.max(b2)  # refresh the prune bound

            best, cur_max = jax.lax.cond(
                is_leafe, leaf_branch, lambda a: a, (best, cur_max))
            node = jnp.maximum(cursor, 0)
            sx, sy, sz = rays[l][0], rays[l][1], rays[l][2]
            sp = _wide_expand(
                nodes_ref, stack_ref, stack_tn_ref, node, sp,
                cursor >= 0,
                [(sx, sy, sz, invs[l][0], invs[l][1], invs[l][2],
                  best)],
                arity, ordered=occ_mode)
            cursor, sp = _wide_pop(stack_ref, stack_tn_ref, sp, cur_max,
                                   base=l * stack_cap)
            # all lanes retired -> finish this walk (any-hit: bests go
            # -1; min mode: cur_max stays positive while queries exist)
            cursor = jnp.where(cur_max > 0.0, cursor, -1)
            cursors[l], sps[l] = cursor, sp
            cur_maxes[l], bests[l] = cur_max, best
        return (*cursors, *sps, *cur_maxes, *bests)

    def cond(c):
        done = c[0] == -1
        for l in range(1, L):
            done = done & (c[l] == -1)
        return ~done

    cur0s = [jnp.max(b) for b in bests]
    cursor0s = [jnp.where(cur0s[l] > 0.0, 0, -1).astype(jnp.int32)
                for l in range(L)]
    sp0s = [jnp.int32(l * stack_cap) for l in range(L)]
    out = jax.lax.while_loop(
        cond, _unrolled(body, unroll),
        (*cursor0s, *sp0s, *cur0s, *bests))
    bests = list(out[3 * L:4 * L])
    if min_mode:
        masks = [(bests[l] < best0s[l]) & (best0s[l] > 0.0)
                 for l in range(L)]
        sts = [jnp.where(masks[l], bests[l], _BIG) for l in range(L)]
        return masks, sts
    return [(bests[l] < 0.0) & (best0s[l] > 0.0) for l in range(L)]


def _kernel(depth_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            tr_ref, tg_ref, tb_ref,
            nodes_ref, tris_ref, leafmeta_ref, aux_ref,
            dr_ref, dg_ref, db_ref,
            oxo_ref, oyo_ref, ozo_ref, dxo_ref, dyo_ref, dzo_ref,
            tmo_ref, tro_ref, tgo_ref, tbo_ref,
            *rest,
            n_lights: int, n_spheres: int, n_tris: int, n_mats: int,
            max_bounces: int, arity: int = 0, fuse: bool = True,
            record: bool = False, unroll: int = 1,
            occ_mode: str = "sort", leaf_rows: int = 1,
            light_cull: float = 0.0, tri_isect: str = "mt",
            bw_rows: int = 0, record_soft: bool = False,
            shadow_batch: bool = False, dbg: str = "",
            fork: bool = False, has_mesh: bool = True,
            stale_prune: bool = True, near_mode: str = "sort"):
    # dbg: comma-separated step-overhead decomposition switches (NOT
    # semantics-preserving — A/B instrumentation only, bench/session use):
    #   nonear    skip the nearest mesh walk (spheres/tris/shade remain)
    #   noshadow  skip all shadow walks (treat every light unoccluded)
    #   noleaf    walk the tree but skip all leaf triangle tests
    #   leaf1     leaf visits test only slot 0 (isolates the lax.cond +
    #             branch cost from the leaf vector work)
    #   nosort    nearest-walk pushes unordered (isolates sort network)
    #   noprune   pops skip the stale-entry drop loop
    dbg_set = frozenset(t for t in dbg.split(",") if t)
    # cfg.stale_prune=False (or dbg noprune): skip the prune loop AND
    # the cross-lane max reductions that exist only to maintain its
    # bound
    prune = stale_prune and "noprune" not in dbg_set
    # trailing refs: fork's refract-child outputs OR the optional
    # hit-record outputs (+ per-light min occluder t when record_soft),
    # then the SMEM scratch
    stack_ref, stack_tn_ref = rest[-2:]
    if fork:
        (txo_ref, tyo_ref, tzo_ref, tdx_ref, tdy_ref, tdz_ref,
         twr_ref, twg_ref, twb_ref, ttm_ref) = rest[:10]
    if record:
        rt_ref, rnx_ref, rny_ref, rnz_ref, rmat_ref, rocc_ref = rest[:6]
        rst_refs = rest[6:6 + n_lights] if record_soft else ()
    tile = ox_ref.shape[0]
    live_in = tmax_ref[:] >= 0.0

    # pass-through defaults (overwritten when the tile has live lanes)
    dr_ref[:] = jnp.zeros((tile,), jnp.float32)
    dg_ref[:] = jnp.zeros((tile,), jnp.float32)
    db_ref[:] = jnp.zeros((tile,), jnp.float32)
    oxo_ref[:] = ox_ref[:]
    oyo_ref[:] = oy_ref[:]
    ozo_ref[:] = oz_ref[:]
    dxo_ref[:] = dx_ref[:]
    dyo_ref[:] = dy_ref[:]
    dzo_ref[:] = dz_ref[:]
    tmo_ref[:] = jnp.full((tile,), -1.0, jnp.float32)
    tro_ref[:] = tr_ref[:]
    tgo_ref[:] = tg_ref[:]
    tbo_ref[:] = tb_ref[:]
    if fork:
        txo_ref[:] = ox_ref[:]
        tyo_ref[:] = oy_ref[:]
        tzo_ref[:] = oz_ref[:]
        tdx_ref[:] = dx_ref[:]
        tdy_ref[:] = dy_ref[:]
        tdz_ref[:] = dz_ref[:]
        twr_ref[:] = jnp.zeros((tile,), jnp.float32)
        twg_ref[:] = jnp.zeros((tile,), jnp.float32)
        twb_ref[:] = jnp.zeros((tile,), jnp.float32)
        ttm_ref[:] = jnp.full((tile,), -1.0, jnp.float32)
    if record:
        rt_ref[:] = jnp.full((tile,), -1.0, jnp.float32)
        rnx_ref[:] = jnp.zeros((tile,), jnp.float32)
        rny_ref[:] = jnp.zeros((tile,), jnp.float32)
        rnz_ref[:] = jnp.zeros((tile,), jnp.float32)
        rmat_ref[:] = jnp.full((tile,), -1.0, jnp.float32)
        rocc_ref[:] = jnp.zeros((tile,), jnp.float32)
        for r_ in rst_refs:
            r_[:] = jnp.full((tile,), _BIG, jnp.float32)

    @pl.when(jnp.any(live_in))
    def _tile():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

        tiny = 1e-30
        fix = lambda v: jnp.where(jnp.abs(v) < tiny,
                                  jnp.where(v < 0, -tiny, tiny), v)
        inv_dx = 1.0 / fix(dx)
        inv_dy = 1.0 / fix(dy)
        inv_dz = 1.0 / fix(dz)

        def slab(lx, ly, lz, hx, hy, hz, best_t):
            t1 = (lx - ox) * inv_dx
            t2 = (hx - ox) * inv_dx
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            t1 = (ly - oy) * inv_dy
            t2 = (hy - oy) * inv_dy
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            t1 = (lz - oz) * inv_dz
            t2 = (hz - oz) * inv_dz
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            tn = jnp.maximum(tn, 0.0)
            return (tn <= tf) & (tn <= best_t), tn

        def box_test(row, best_t):
            hit, tn = slab(nodes_ref[row, 0], nodes_ref[row, 1],
                           nodes_ref[row, 2], nodes_ref[row, 3],
                           nodes_ref[row, 4], nodes_ref[row, 5], best_t)
            tn_min = jnp.min(jnp.where(hit, tn, _BIG))
            return jnp.any(hit), tn_min

        def mt(v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z):
            """Moller-Trumbore vs one scalar triangle -> (ok, t)."""
            e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
            e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            par = jnp.abs(det) < EPS
            f = 1.0 / jnp.where(par, 1.0, det)
            sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
            u = f * (sx * px + sy * py + sz * pz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            ok = (~par & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (t > EPS))
            return ok, t

        def tri_normal(v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z):
            """Scalar bake-convention shading normal: -norm(cross(
            v2-v0, v1-v0)) (SceneMesh.cs:43; winding canonicalized)."""
            e1x, e1y, e1z = v2x - v0x, v2y - v0y, v2z - v0z
            e2x, e2y, e2z = v1x - v0x, v1y - v0y, v1z - v0z
            cx = e1y * e2z - e1z * e2y
            cy = e1z * e2x - e1x * e2z
            cz = e1x * e2y - e1y * e2x
            inv = -jax.lax.rsqrt(
                jnp.maximum(cx * cx + cy * cy + cz * cz, 1e-60))
            return cx * inv, cy * inv, cz * inv

        # ---- nearest mesh hit ------------------------------------------
        # arity > 0: wide-node ordered walk (traverse_wide layout in
        # nodes_ref); arity == 0: binary ordered descent (traverse_mk4).
        # cur_max (the stale-pop bound) rides in the carry and is
        # refreshed only on leaf steps — interior steps pay no
        # cross-lane reduction for it.
        def near_leaf_tests(leaf_row, args):
            best_t, bnx, bny, bnz, bmat = args
            if "noleaf" in dbg_set:
                return best_t, bnx, bny, bnz, bmat
            n_slots = (1 if "leaf1" in dbg_set
                       else leaf_rows * PALLAS_LEAF)
            if tri_isect == "bw":
                # tris_ref holds the BW rows; node meta still points at
                # MT row bases, so rebase: leaf index * bw rows per leaf
                bwbase = (leaf_row // leaf_rows) * bw_rows
                for j in range(n_slots):
                    row = bwbase + j // BW_PER_ROW
                    b = 12 * (j % BW_PER_ROW)
                    rec = tuple(tris_ref[row, b + q] for q in range(12))
                    ok, t = _bw1((ox, oy, oz), (dx, dy, dz), rec)
                    upd = ok & (t < best_t)
                    mid = leafmeta_ref[leaf_row + j // PALLAS_LEAF,
                                       j % PALLAS_LEAF]
                    best_t = jnp.where(upd, t, best_t)
                    # the stored unit plane normal IS the bake-convention
                    # shading normal (pack_bw docstring) — no cross/rsqrt
                    bnx = jnp.where(upd, rec[0], bnx)
                    bny = jnp.where(upd, rec[1], bny)
                    bnz = jnp.where(upd, rec[2], bnz)
                    bmat = jnp.where(upd, mid, bmat)
                return best_t, bnx, bny, bnz, bmat
            for rr, k in [(r_, k_) for r_ in range(leaf_rows)
                          for k_ in range(PALLAS_LEAF)][:n_slots]:
                row = leaf_row + rr
                b = 9 * k
                vs = tuple(tris_ref[row, b + j] for j in range(9))
                ok, t = mt(*vs)
                # pad slots are all-zero triangles -> det==0 reject;
                # no per-leaf count needed in the wide encoding
                upd = ok & (t < best_t)
                nx, ny, nz = tri_normal(*vs)
                mid = leafmeta_ref[row, k]
                best_t = jnp.where(upd, t, best_t)
                bnx = jnp.where(upd, nx, bnx)
                bny = jnp.where(upd, ny, bny)
                bnz = jnp.where(upd, nz, bnz)
                bmat = jnp.where(upd, mid, bmat)
            return best_t, bnx, bny, bnz, bmat

        def near_body_wide(c):
            cursor, sp, cur_max, best_t, bnx, bny, bnz, bmat = c
            is_leafe = cursor < -1
            leaf_row = jnp.maximum(-cursor - 2, 0)

            def leaf_branch(args):
                out = near_leaf_tests(leaf_row, args[:-1])
                # cur_max refresh: a cross-lane reduction, needed only
                # while the stale-prune consumes the bound
                return out + ((jnp.max(out[0]) if prune
                               else args[-1]),)

            (best_t, bnx, bny, bnz, bmat, cur_max) = jax.lax.cond(
                is_leafe, leaf_branch, lambda a: a,
                (best_t, bnx, bny, bnz, bmat, cur_max))
            node = jnp.maximum(cursor, 0)
            nm = "none" if "nosort" in dbg_set else near_mode
            sp = _wide_expand(nodes_ref, stack_ref, stack_tn_ref,
                              node, sp, cursor >= 0,
                              [(ox, oy, oz, inv_dx, inv_dy, inv_dz,
                                best_t)], arity, ordered=nm)
            cursor, sp = _wide_pop(stack_ref, stack_tn_ref, sp, cur_max,
                                   prune=prune)
            return cursor, sp, cur_max, best_t, bnx, bny, bnz, bmat

        def near_body(c):
            cursor, sp, best_t, bnx, bny, bnz, bmat = c
            any_lane, _ = box_test(cursor, best_t)
            leaf_row = nodes_ref[cursor, 6].astype(jnp.int32)
            count = nodes_ref[cursor, 7].astype(jnp.int32)
            right = nodes_ref[cursor, 9].astype(jnp.int32)
            is_leaf = count > 0

            def leaf_tests(args):
                best_t, bnx, bny, bnz, bmat = args
                for rr, k in [(r_, k_) for r_ in range(leaf_rows)
                              for k_ in range(PALLAS_LEAF)]:
                    row = leaf_row + rr
                    b = 9 * k
                    vs = tuple(tris_ref[row, b + j] for j in range(9))
                    ok, t = mt(*vs)
                    upd = (ok & ((rr * PALLAS_LEAF + k) < count)
                           & (t < best_t))
                    nx, ny, nz = tri_normal(*vs)
                    mid = leafmeta_ref[row, k]
                    best_t = jnp.where(upd, t, best_t)
                    bnx = jnp.where(upd, nx, bnx)
                    bny = jnp.where(upd, ny, bny)
                    bnz = jnp.where(upd, nz, bnz)
                    bmat = jnp.where(upd, mid, bmat)
                return best_t, bnx, bny, bnz, bmat

            best_t, bnx, bny, bnz, bmat = jax.lax.cond(
                is_leaf & any_lane, leaf_tests, lambda a: a,
                (best_t, bnx, bny, bnz, bmat))

            expand = any_lane & ~is_leaf
            left = cursor + 1
            safe_r = jnp.maximum(right, 0)
            hit_l, tn_l = box_test(left, best_t)
            hit_r, tn_r = box_test(safe_r, best_t)
            hit_l = hit_l & expand
            hit_r = hit_r & expand & (right >= 0)
            l_first = jnp.where(hit_l & hit_r, tn_l <= tn_r, hit_l)
            near = jnp.where(l_first, left, safe_r)
            far = jnp.where(l_first, safe_r, left)
            far_tn = jnp.where(l_first, tn_r, tn_l)
            both = hit_l & hit_r
            go_down = both | (hit_l ^ hit_r)

            @pl.when(both)
            def _():
                stack_ref[sp] = far
                stack_tn_ref[sp] = far_tn
            sp = jnp.where(both, sp + 1, sp)

            cur_max = jnp.max(best_t)

            def pop_cond(s):
                sp_, cur_ = s
                stale = stack_tn_ref[jnp.maximum(sp_ - 1, 0)] > cur_max
                return (cur_ < 0) & (sp_ > 0) & stale

            cursor = jnp.where(go_down, near, -1)
            sp, cursor = jax.lax.while_loop(
                pop_cond, lambda s: (s[0] - 1, s[1]), (sp, cursor))
            do_pop = (cursor < 0) & (sp > 0)
            cursor = jnp.where(do_pop,
                               stack_ref[jnp.maximum(sp - 1, 0)], cursor)
            sp = jnp.where(do_pop, sp - 1, sp)
            return cursor, sp, best_t, bnx, bny, bnz, bmat

        zeros = jnp.zeros((tile,), jnp.float32)
        best_t0 = jnp.where(live_in, _BIG, -1.0)
        bmat0 = jnp.full((tile,), -1.0, jnp.float32)
        # unroll applies to the wide walk only (its body is -1-safe; the
        # binary body indexes nodes_ref at the cursor and is not)
        if "nonear" in dbg_set or not has_mesh:
            best_t, bnx, bny, bnz, bmat = (best_t0, zeros, zeros, zeros,
                                           bmat0)
        elif arity:
            _, _, _, best_t, bnx, bny, bnz, bmat = jax.lax.while_loop(
                lambda c: c[0] != -1,
                _unrolled(near_body_wide, unroll),
                (jnp.int32(0), jnp.int32(0), jnp.max(best_t0),
                 best_t0, zeros, zeros, zeros, bmat0))
        else:
            _, _, best_t, bnx, bny, bnz, bmat = jax.lax.while_loop(
                lambda c: c[0] >= 0, near_body,
                (jnp.int32(0), jnp.int32(0), best_t0, zeros, zeros,
                 zeros, bmat0))

        # ---- spheres then loose triangles (reference combine order,
        #      strict > update: Scene.cs:94,107) -------------------------
        for s in range(n_spheres):
            r = 1 + n_lights + s
            cx_s = aux_ref[r, 0]
            cy_s = aux_ref[r, 1]
            cz_s = aux_ref[r, 2]
            r2 = aux_ref[r, 3]
            svalid = aux_ref[r, 4] > 0.0
            smat = aux_ref[r, 5]
            ocx, ocy, ocz = ox - cx_s, oy - cy_s, oz - cz_s
            uoc = dx * ocx + dy * ocy + dz * ocz
            oc2 = ocx * ocx + ocy * ocy + ocz * ocz
            disc = uoc * uoc - (oc2 - r2)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            big = -uoc + sq
            small = -uoc - sq
            t_s = jnp.where(small < 0.0, big, small)
            ok = (disc >= 0.0) & (big >= 0.0) & svalid
            upd = ok & (best_t > t_s)
            # sphere normal (p - c)/r, |p - c| = r exactly at the hit
            rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-60))
            px = ox + dx * t_s - cx_s
            py = oy + dy * t_s - cy_s
            pz = oz + dz * t_s - cz_s
            best_t = jnp.where(upd, t_s, best_t)
            bnx = jnp.where(upd, px * rinv, bnx)
            bny = jnp.where(upd, py * rinv, bny)
            bnz = jnp.where(upd, pz * rinv, bnz)
            bmat = jnp.where(upd, smat, bmat)

        for tt in range(n_tris):
            r = 1 + n_lights + n_spheres + tt
            vs = tuple(aux_ref[r, j] for j in range(9))
            ok, t_t = mt(*vs)
            tvalid = aux_ref[r, 12] > 0.0
            upd = ok & tvalid & (best_t > t_t)
            best_t = jnp.where(upd, t_t, best_t)
            bnx = jnp.where(upd, aux_ref[r, 9], bnx)
            bny = jnp.where(upd, aux_ref[r, 10], bny)
            bnz = jnp.where(upd, aux_ref[r, 11], bnz)
            bmat = jnp.where(upd, aux_ref[r, 13], bmat)

        # scene-AABB early-out mask (Scene.cs:54)
        in_box, _ = slab(aux_ref[0, 0], aux_ref[0, 1], aux_ref[0, 2],
                         aux_ref[0, 3], aux_ref[0, 4], aux_ref[0, 5],
                         jnp.full((tile,), _BIG, jnp.float32))
        hit = live_in & in_box & (best_t < _BIG) & (best_t >= 0.0)

        # ---- material select (static unroll over the combined table) ---
        mbase = 1 + n_lights + n_spheres + n_tris
        nf = 19 if fork else 14  # fork also reads transparency/ior/die
        mfields = [zeros] * nf
        for m in range(n_mats):
            sel = bmat == m
            for j in range(nf):
                mfields[j] = jnp.where(sel, aux_ref[mbase + m, j],
                                       mfields[j])
        (kd_r, kd_g, kd_b, ka_r, ka_g, ka_b, km_r, km_g, km_b,
         ks_r, ks_g, ks_b, phong, is_mir_f) = mfields[:14]
        if fork:
            (tp_r, tp_g, tp_b, ior_f, is_die_f) = mfields[14:19]

        t_safe = jnp.where(hit, best_t, 1.0)
        px = ox + dx * t_safe
        py = oy + dy * t_safe
        pz = oz + dz * t_safe

        # ---- direct lighting ------------------------------------------
        amb_r, amb_g, amb_b = aux_ref[0, 6], aux_ref[0, 7], aux_ref[0, 8]
        col_r = ka_r * amb_r
        col_g = ka_g * amb_g
        col_b = ka_b * amb_b

        # shadow ray origin p + n*eps (:330-333) — light-independent
        sx = px + bnx * SHADOW_EPS
        sy = py + bny * SHADOW_EPS
        sz = pz + bnz * SHADOW_EPS

        # per-light geometry pass (static unroll; all vectors stay live
        # across the fused occlusion walk — ~10 tile-vectors per light)
        if light_cull > 0.0:
            # conservative contribution bound (max(kd)+max(ks))*max(I)/d^2:
            # lanes below threshold skip the shadow walk AND the light's
            # terms (bounded error <= light_cull per light; cfg docstring)
            kdks = (jnp.maximum(jnp.maximum(kd_r, kd_g), kd_b)
                    + jnp.maximum(jnp.maximum(ks_r, ks_g), ks_b))
        geo = []
        for l in range(n_lights):
            r = 1 + l
            lx_, ly_, lz_ = aux_ref[r, 0], aux_ref[r, 1], aux_ref[r, 2]
            lvalid = aux_ref[r, 6] > 0.0
            lvx, lvy, lvz = lx_ - px, ly_ - py, lz_ - pz
            ld2 = lvx * lvx + lvy * lvy + lvz * lvz
            ldist = jnp.sqrt(ld2)
            linv = jax.lax.rsqrt(jnp.maximum(ld2, 1e-60))
            ldx, ldy, ldz = lvx * linv, lvy * linv, lvz * linv
            ln = ldx * bnx + ldy * bny + ldz * bnz
            need = hit & (ln >= 0.0) & lvalid
            if light_cull > 0.0:
                imax = jnp.maximum(jnp.maximum(aux_ref[r, 3],
                                               aux_ref[r, 4]),
                                   aux_ref[r, 5])
                need = need & (kdks * imax >= light_cull * ld2)
            geo.append((ldx, ldy, ldz, ln, need, ldist, ld2))

        sts = None
        if "noshadow" in dbg_set:
            occs = [jnp.zeros((tile,), bool) for _ in range(n_lights)]
            if record_soft:
                sts = [jnp.full((tile,), _BIG, jnp.float32)
                       for _ in range(n_lights)]
        elif arity and n_lights and fuse and has_mesh:
            occs = _occluded_fused(
                nodes_ref, tris_ref, aux_ref,
                [(sx, sy, sz, g[0], g[1], g[2],
                  jnp.where(g[4], g[5], -1.0)) for g in geo],
                n_lights, n_spheres, n_tris,
                stack_ref, stack_tn_ref, arity, unroll=unroll,
                occ_mode=occ_mode, leaf_rows=leaf_rows,
                tri_isect=tri_isect, bw_rows=bw_rows,
                min_mode=record_soft)
            if record_soft:
                occs, sts = occs
        elif arity and n_lights and shadow_batch and has_mesh:
            occs = _occluded_batch(
                nodes_ref, tris_ref, aux_ref,
                [(sx, sy, sz, g[0], g[1], g[2],
                  jnp.where(g[4], g[5], -1.0)) for g in geo],
                n_lights, n_spheres, n_tris,
                stack_ref, stack_tn_ref, arity, unroll=unroll,
                occ_mode=occ_mode, leaf_rows=leaf_rows,
                tri_isect=tri_isect, bw_rows=bw_rows,
                min_mode=record_soft)
            if record_soft:
                occs, sts = occs
        else:
            occs = [
                _occluded(nodes_ref, tris_ref, aux_ref, sx, sy, sz,
                          g[0], g[1], g[2], jnp.where(g[4], g[5], -1.0),
                          n_lights, n_spheres, n_tris,
                          stack_ref, stack_tn_ref, arity,
                          occ_mode=occ_mode, leaf_rows=leaf_rows,
                          tri_isect=tri_isect, bw_rows=bw_rows,
                          min_mode=record_soft, dbg_set=dbg_set,
                          has_mesh=has_mesh, prune=prune)
                for g in geo]
            if record_soft:
                sts = [p[1] for p in occs]
                occs = [p[0] for p in occs]

        for l in range(n_lights):
            r = 1 + l
            ir_, ig_, ib_ = aux_ref[r, 3], aux_ref[r, 4], aux_ref[r, 5]
            ldx, ldy, ldz, ln, need, ldist, ld2 = geo[l]
            occ = occs[l]

            irr = 1.0 / jnp.maximum(ld2, 1e-60)   # Intensity/d^2 (:350)
            lit = need & ~occ
            w = jnp.where(lit, irr, 0.0)
            dterm = jnp.maximum(0.0, ln) * w      # (:443-455)
            col_r += kd_r * dterm * ir_
            col_g += kd_g * dterm * ig_
            col_b += kd_b * dterm * ib_

            # Blinn-Phong specular, halfway (l + v)/|.| with v = -d
            hx_, hy_, hz_ = ldx - dx, ldy - dy, ldz - dz
            hinv = jax.lax.rsqrt(jnp.maximum(
                hx_ * hx_ + hy_ * hy_ + hz_ * hz_, 1e-60))
            nh = jnp.maximum(
                0.0, bnx * hx_ * hinv + bny * hy_ * hinv
                + bnz * hz_ * hinv)
            sterm = jnp.where(nh > 0.0,
                              jnp.exp(phong * jnp.log(
                                  jnp.maximum(nh, 1e-30))), 0.0) * w
            col_r += ks_r * sterm * ir_
            col_g += ks_g * sterm * ig_
            col_b += ks_b * sterm * ib_

        bg_r, bg_g, bg_b = aux_ref[0, 9], aux_ref[0, 10], aux_ref[0, 11]
        out_r = jnp.where(hit, col_r, bg_r)
        out_g = jnp.where(hit, col_g, bg_g)
        out_b = jnp.where(hit, col_b, bg_b)

        thr_r, thg, thb = tr_ref[:], tg_ref[:], tb_ref[:]
        livef = live_in.astype(jnp.float32)
        dr_ref[:] = thr_r * out_r * livef
        dg_ref[:] = thg * out_g * livef
        db_ref[:] = thb * out_b * livef

        if record:
            # hit records for the differentiable shading replay
            # (ops/replay.py): winner t / shading normal / combined
            # material id, plus per-light occlusion bits. Lanes that
            # miss (or are dead) keep t = mat = -1.
            rt_ref[:] = jnp.where(hit, best_t, -1.0)
            rnx_ref[:] = bnx
            rny_ref[:] = bny
            rnz_ref[:] = bnz
            rmat_ref[:] = jnp.where(hit, bmat, -1.0)
            occm = jnp.zeros((tile,), jnp.float32)
            for l in range(n_lights):
                occm += occs[l].astype(jnp.float32) * float(1 << l)
            rocc_ref[:] = occm
            if record_soft:
                for l in range(n_lights):
                    rst_refs[l][:] = sts[l]

        depth = depth_ref[0]
        ddn = dx * bnx + dy * bny + dz * bnz
        if fork:
            # ---- dielectric fork (ops/render._trace_tree semantics) ----
            # reflect child shared by mirrors (weight is_mirror*mirror)
            # and dielectrics (weight is_die*Fresnel*transparency);
            # refract child for non-TIR dielectric hits. Base refs carry
            # the REFLECT child, the fork refs the REFRACT child; lane
            # liveness rides the tmax outputs (-1 = dead).
            entering = ddn < 0.0
            sgn = jnp.where(entering, 1.0, -1.0)
            nex, ney, nez = bnx * sgn, bny * sgn, bnz * sgn
            is_die = is_die_f > 0.0
            is_mir = is_mir_f > 0.0
            nrx = jnp.where(is_die, nex, bnx)
            nry = jnp.where(is_die, ney, bny)
            nrz = jnp.where(is_die, nez, bnz)
            rddn = dx * nrx + dy * nry + dz * nrz
            rdx = dx - 2.0 * nrx * rddn
            rdy = dy - 2.0 * nry * rddn
            rdz = dz - 2.0 * nrz * rddn
            cos_i = jnp.abs(ddn)
            n1 = jnp.where(entering, 1.0, ior_f)
            n2v = jnp.maximum(jnp.where(entering, ior_f, 1.0), 1e-6)
            eta = n1 / n2v
            kq = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
            tir = kq < 0.0
            sq = jnp.sqrt(jnp.where(tir, 1.0, kq))
            tfac = eta * cos_i - sq
            tdx = eta * dx + tfac * nex
            tdy = eta * dy + tfac * ney
            tdz = eta * dz + tfac * nez
            r0 = ((n1 - n2v) / (n1 + n2v)) ** 2
            fres = jnp.where(tir, 1.0,
                             r0 + (1.0 - r0) * (1.0 - cos_i) ** 5)
            hm = hit.astype(jnp.float32)
            w_re_r = (is_mir_f * km_r + is_die_f * fres * tp_r) * hm
            w_re_g = (is_mir_f * km_g + is_die_f * fres * tp_g) * hm
            w_re_b = (is_mir_f * km_b + is_die_f * fres * tp_b) * hm
            refr_ok = hit & is_die & ~tir
            rof = refr_ok.astype(jnp.float32)
            w_tr_r = is_die_f * (1.0 - fres) * tp_r * rof
            w_tr_g = is_die_f * (1.0 - fres) * tp_g * rof
            w_tr_b = is_die_f * (1.0 - fres) * tp_b * rof
            can = live_in & (depth < max_bounces)
            refl_live = can & hit & (is_mir | is_die)
            refr_live = can & refr_ok
            # reflect child (base continuation refs)
            oxo_ref[:] = px + nrx * SHADOW_EPS
            oyo_ref[:] = py + nry * SHADOW_EPS
            ozo_ref[:] = pz + nrz * SHADOW_EPS
            dxo_ref[:] = jnp.where(hit, rdx, 0.0)
            dyo_ref[:] = jnp.where(hit, rdy, 0.0)
            dzo_ref[:] = jnp.where(hit, rdz, 1.0)
            tmo_ref[:] = jnp.where(refl_live, _BIG, -1.0)
            tro_ref[:] = thr_r * w_re_r
            tgo_ref[:] = thg * w_re_g
            tbo_ref[:] = thb * w_re_b
            # refract child (fork refs)
            txo_ref[:] = px - nex * SHADOW_EPS
            tyo_ref[:] = py - ney * SHADOW_EPS
            tzo_ref[:] = pz - nez * SHADOW_EPS
            tdx_ref[:] = jnp.where(refr_ok, tdx, 0.0)
            tdy_ref[:] = jnp.where(refr_ok, tdy, 0.0)
            tdz_ref[:] = jnp.where(refr_ok, tdz, 1.0)
            ttm_ref[:] = jnp.where(refr_live, _BIG, -1.0)
            twr_ref[:] = thr_r * w_tr_r
            twg_ref[:] = thg * w_tr_g
            twb_ref[:] = thb * w_tr_b
            return

        # ---- mirror continuation (:358-373) ----------------------------
        cont = live_in & hit & (is_mir_f > 0.0) & (depth < max_bounces)
        rdx = dx - 2.0 * bnx * ddn
        rdy = dy - 2.0 * bny * ddn
        rdz = dz - 2.0 * bnz * ddn
        oxo_ref[:] = px + bnx * SHADOW_EPS
        oyo_ref[:] = py + bny * SHADOW_EPS
        ozo_ref[:] = pz + bnz * SHADOW_EPS
        dxo_ref[:] = jnp.where(cont, rdx, dx)
        dyo_ref[:] = jnp.where(cont, rdy, dy)
        dzo_ref[:] = jnp.where(cont, rdz, dz)
        tmo_ref[:] = jnp.where(cont, _BIG, -1.0)
        tro_ref[:] = jnp.where(cont, thr_r * km_r, thr_r)
        tgo_ref[:] = jnp.where(cont, thg * km_g, thg)
        tbo_ref[:] = jnp.where(cont, thb * km_b, thb)


def _occluded(nodes_ref, tris_ref, aux_ref, sx, sy, sz, ldx, ldy, ldz,
              tmax, n_lights, n_spheres, n_tris,
              stack_ref=None, stack_tn_ref=None, arity=0,
              occ_mode="sort", leaf_rows=1, tri_isect="mt", bw_rows=0,
              min_mode=False, dbg_set=frozenset(), has_mesh=True,
              prune=True):
    """Embedded any-hit occlusion query (wide stack walk when ``arity``,
    else binary threaded traversal order — ordering buys little for
    any-hit, but the wide layout still quarters the step count).

    ``tmax`` is the light distance per lane, -1 for lanes that need no
    query. Returns a bool mask: some primitive with t < tmax (strictly:
    t^2 < dist^2 like RayTracingSetup.cs:337-345 — equal since both
    positive). Includes the scene-AABB gate the reference's shadow query
    inherits from IntersectRay.
    """
    tiny = 1e-30
    fix = lambda v: jnp.where(jnp.abs(v) < tiny,
                              jnp.where(v < 0, -tiny, tiny), v)
    inv_x = 1.0 / fix(ldx)
    inv_y = 1.0 / fix(ldy)
    inv_z = 1.0 / fix(ldz)

    def slab(lx, ly, lz, hx, hy, hz, best_t):
        t1 = (lx - sx) * inv_x
        t2 = (hx - sx) * inv_x
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2)
        t1 = (ly - sy) * inv_y
        t2 = (hy - sy) * inv_y
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        t1 = (lz - sz) * inv_z
        t2 = (hz - sz) * inv_z
        tn = jnp.maximum(tn, jnp.minimum(t1, t2))
        tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        tn = jnp.maximum(tn, 0.0)
        return (tn <= tf) & (tn <= best_t)

    def mt(v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z):
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        px_ = ldy * e2z - ldz * e2y
        py_ = ldz * e2x - ldx * e2z
        pz_ = ldx * e2y - ldy * e2x
        det = e1x * px_ + e1y * py_ + e1z * pz_
        par = jnp.abs(det) < EPS
        f = 1.0 / jnp.where(par, 1.0, det)
        qx_, qy_, qz_ = sx - v0x, sy - v0y, sz - v0z
        u = f * (qx_ * px_ + qy_ * py_ + qz_ * pz_)
        cx_ = qy_ * e1z - qz_ * e1y
        cy_ = qz_ * e1x - qx_ * e1z
        cz_ = qx_ * e1y - qy_ * e1x
        v = f * (ldx * cx_ + ldy * cy_ + ldz * cz_)
        t = f * (e2x * cx_ + e2y * cy_ + e2z * cz_)
        ok = (~par & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > EPS))
        return ok, t

    in_box = slab(aux_ref[0, 0], aux_ref[0, 1], aux_ref[0, 2],
                  aux_ref[0, 3], aux_ref[0, 4], aux_ref[0, 5],
                  jnp.full(sx.shape, _BIG, jnp.float32))
    best0 = jnp.where(in_box, tmax, -1.0)

    # spheres + loose tris first (cheap, may retire lanes before the walk)
    best = best0
    for s in range(n_spheres):
        r = 1 + n_lights + s
        ocx = sx - aux_ref[r, 0]
        ocy = sy - aux_ref[r, 1]
        ocz = sz - aux_ref[r, 2]
        r2 = aux_ref[r, 3]
        svalid = aux_ref[r, 4] > 0.0
        uoc = ldx * ocx + ldy * ocy + ldz * ocz
        oc2 = ocx * ocx + ocy * ocy + ocz * ocz
        disc = uoc * uoc - (oc2 - r2)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        big = -uoc + sq
        small = -uoc - sq
        t_s = jnp.where(small < 0.0, big, small)
        ok = (disc >= 0.0) & (big >= 0.0) & svalid
        best = jnp.where(ok & (t_s < best), t_s if min_mode else -1.0,
                         best)
    for tt in range(n_tris):
        r = 1 + n_lights + n_spheres + tt
        ok, t_t = mt(*tuple(aux_ref[r, j] for j in range(9)))
        ok = ok & (aux_ref[r, 12] > 0.0)
        best = jnp.where(ok & (t_t < best), t_t if min_mode else -1.0,
                         best)

    if not has_mesh:  # brute-force scene: no BVH walk to run
        if min_mode:
            mask = (best < best0) & (best0 > 0.0)
            return mask, jnp.where(mask, best, _BIG)
        return (best < 0.0) & (best0 > 0.0)

    if arity:
        def body_w(c):
            cursor, sp, best = c
            is_leafe = cursor < -1
            leaf_row = jnp.maximum(-cursor - 2, 0)

            def leaf_tests(best):
                if "noleaf" in dbg_set:
                    return best
                n_slots = (1 if "leaf1" in dbg_set
                           else leaf_rows * PALLAS_LEAF)
                if tri_isect == "bw":
                    bwbase = (leaf_row // leaf_rows) * bw_rows
                    for j in range(n_slots):
                        row = bwbase + j // BW_PER_ROW
                        b = 12 * (j % BW_PER_ROW)
                        rec = tuple(tris_ref[row, b + q]
                                    for q in range(12))
                        ok, t = _bw1((sx, sy, sz), (ldx, ldy, ldz), rec)
                        best = jnp.where(ok & (t < best),
                                         t if min_mode else -1.0, best)
                    return best
                for rr, k in [(r_, k_) for r_ in range(leaf_rows)
                              for k_ in range(PALLAS_LEAF)][:n_slots]:
                    b = 9 * k
                    ok, t = mt(*tuple(tris_ref[leaf_row + rr, b + j]
                                      for j in range(9)))
                    best = jnp.where(ok & (t < best),
                                     t if min_mode else -1.0, best)
                return best

            best = jax.lax.cond(is_leafe, leaf_tests, lambda b: b, best)
            node = jnp.maximum(cursor, 0)
            sp = _wide_expand(nodes_ref, stack_ref, stack_tn_ref, node,
                              sp, cursor >= 0,
                              [(sx, sy, sz, inv_x, inv_y, inv_z, best)],
                              arity, ordered=occ_mode)
            # the prune bound is a per-step cross-lane reduction — skip
            # it entirely when pruning is off (cfg.stale_prune)
            cursor, sp = _wide_pop(stack_ref, stack_tn_ref, sp,
                                   jnp.max(best) if prune else 0.0,
                                   prune=prune)
            return cursor, sp, best

        def cond_w(c):
            return (c[0] != -1) & jnp.any(c[2] > 0.0)

        _, _, best = jax.lax.while_loop(
            cond_w, body_w, (jnp.int32(0), jnp.int32(0), best))
        if min_mode:
            mask = (best < best0) & (best0 > 0.0)
            return mask, jnp.where(mask, best, _BIG)
        return (best < 0.0) & (best0 > 0.0)

    def body(c):
        cursor, best = c
        lane_hit = slab(nodes_ref[cursor, 0], nodes_ref[cursor, 1],
                        nodes_ref[cursor, 2], nodes_ref[cursor, 3],
                        nodes_ref[cursor, 4], nodes_ref[cursor, 5], best)
        any_lane = jnp.any(lane_hit)
        leaf_row = nodes_ref[cursor, 6].astype(jnp.int32)
        count = nodes_ref[cursor, 7].astype(jnp.int32)
        miss = nodes_ref[cursor, 8].astype(jnp.int32)
        is_leaf = count > 0

        def leaf_tests(best):
            for rr, k in [(r_, k_) for r_ in range(leaf_rows)
                          for k_ in range(PALLAS_LEAF)]:
                b = 9 * k
                ok, t = mt(*tuple(tris_ref[leaf_row + rr, b + j]
                                  for j in range(9)))
                best = jnp.where(
                    ok & ((rr * PALLAS_LEAF + k) < count) & (t < best),
                    t if min_mode else -1.0, best)
            return best

        best = jax.lax.cond(is_leaf & any_lane, leaf_tests,
                            lambda b: b, best)
        cursor = jnp.where(any_lane & ~is_leaf, cursor + 1, miss)
        return cursor, best

    def cond(c):
        return (c[0] >= 0) & jnp.any(c[1] > 0.0)

    _, best = jax.lax.while_loop(cond, body, (jnp.int32(0), best))
    if min_mode:
        mask = (best < best0) & (best0 > 0.0)
        return mask, jnp.where(mask, best, _BIG)
    return (best < 0.0) & (best0 > 0.0)


def build_aux(scene, background) -> jnp.ndarray:
    """Pack scene constants into the [rows,128] aux block (see module
    docstring). jnp ops — safe under jit with a traced scene."""
    L = scene.lights.positions.shape[0]
    S = scene.spheres.count
    T = scene.triangles.count

    def row(*vals):
        v = jnp.concatenate(
            [jnp.atleast_1d(jnp.asarray(x, jnp.float32)).ravel()
             for x in vals])
        return jnp.pad(v, (0, 128 - v.shape[0]))

    bg = jnp.asarray(background, jnp.float32) * 255.0
    rows = [row(scene.aabb_min, scene.aabb_max, scene.lights.ambient, bg)]
    for l in range(L):
        rows.append(row(scene.lights.positions[l],
                        scene.lights.intensities[l],
                        scene.lights.valid[l].astype(jnp.float32)))
    for s in range(S):
        rows.append(row(scene.spheres.centers[s],
                        scene.spheres.radius_sq[s],
                        scene.spheres.valid[s].astype(jnp.float32),
                        jnp.float32(s)))
    for t in range(T):
        rows.append(row(scene.triangles.verts[t].ravel(),
                        scene.triangles.normals[t],
                        scene.triangles.valid[t].astype(jnp.float32),
                        jnp.float32(S + t)))
    mats = [(scene.spheres.materials, S), (scene.triangles.materials, T),
            (scene.meshes.mesh_materials, scene.meshes.mesh_count)]
    for m, cnt in mats:
        for i in range(cnt):
            rows.append(row(m.diffuse[i], m.ambient[i], m.mirror[i],
                            m.specular[i], m.phong[i],
                            m.is_mirror[i].astype(jnp.float32),
                            m.transparency[i], m.ior[i],
                            m.is_dielectric[i].astype(jnp.float32)))
    return jnp.stack(rows, axis=0)


def trace_segment(packed: PackedBVH, aux: jnp.ndarray, depth: jnp.ndarray,
                  o: jnp.ndarray, d: jnp.ndarray, thr: jnp.ndarray,
                  tmax: jnp.ndarray, *, n_lights: int, n_spheres: int,
                  n_tris: int, max_bounces: int, interpret: bool = False,
                  tile_r: int = TILE_R, use_wide: bool | None = None,
                  fuse_shadows: bool = True, record: bool = False,
                  walk_unroll: int = 1, occ_mode: str = "sort",
                  light_cull: float = 0.0, tri_isect: str = "mt",
                  record_soft: bool = False,
                  shadow_batch: bool = False, dbg: str = "",
                  fork: bool = False, has_mesh: bool = True,
                  stale_prune: bool = True, near_mode: str = "sort"):
    """One fused bounce segment over all rays.

    Returns ``(delta [N,3], o' [N,3], d' [N,3], thr' [N,3], tmax' [N])``:
    radiance contribution (throughput-weighted, 0-255 scale) and the
    continuation rays (``tmax' < 0`` = retired).

    ``use_wide``: walk the wide (BVH4/8) node rows instead of the binary
    layout — the measured step-count win (docs/KERNELS.md). Default: wide
    whenever ``packed.wide`` exists (prepare_bvh builds it).

    ``record=True`` appends a hit-record tuple
    ``(t [N], n [N,3], matid [N], occbits [N])`` to the return — the
    winner geometry/material/occlusion facts the differentiable shading
    replay (ops/replay.py) needs to rebuild this segment's radiance
    without re-traversing. All f32; t/matid are -1 on miss, occbits is a
    per-light occlusion bitmask.

    ``record_soft=True`` (implies record) additionally runs the shadow
    walks in MIN mode (nearest-style — no early lane retire) and appends
    ``st [N, n_lights]``: the min occluder distance per light (_BIG when
    unoccluded), the quantity the soft-shadow sigmoid needs
    (ops/replay.replay_radiance_soft).

    ``shadow_batch``: advance all per-light shadow walks in ONE
    while_loop with independent cursors/stacks (_occluded_batch) —
    pays the per-iteration loop overhead max(steps) times instead of
    sum(steps). Mutually exclusive with ``fuse_shadows``.
    ``dbg``: step-overhead decomposition switches (see _kernel) — NOT
    semantics-preserving; for measurement sessions only.

    ``fork=True`` (the fused TREE-level kernel, baseline config 2):
    instead of the mirror continuation, every dielectric/mirror hit
    emits a REFLECT child on the base continuation refs and a REFRACT
    child appended to the return —
    ``(delta, ro, rd, w_refl, tmax_refl, to, td, w_refr, tmax_refr)``
    with _trace_tree's exact weights (Schlick Fresnel, TIR mask).
    Forward-only (mutually exclusive with record). ``has_mesh=False``
    skips every BVH walk — the brute sphere/loose-triangle scene path
    (cornell) needs no tree; pass a dummy 1-row PackedBVH.
    """
    record = record or record_soft
    if fork and record:
        raise ValueError("fork mode is forward-only (no hit records)")
    if packed.leafmeta is None:
        raise ValueError("PackedBVH.leafmeta missing — build the BVH via "
                         "prepare_bvh for the megakernel path")
    if record and n_lights > 24:
        # per-light occlusion bits are packed as a float32 sum of 2^l;
        # f32 integer exactness ends at 2^24 and the shift unpacking in
        # ops/replay.py is undefined past bit 31 (advisor r3 finding)
        raise ValueError(
            f"record=True packs per-light occlusion bits into one f32 "
            f"(exact only for <= 24 lights); got n_lights={n_lights}")
    n = o.shape[0]
    n_pad = (-n) % tile_r
    pad1 = lambda x, v: (jnp.concatenate(
        [x, jnp.full((n_pad,), v, x.dtype)]) if n_pad else x)
    ox = pad1(o[:, 0], 0.0)
    oy = pad1(o[:, 1], 0.0)
    oz = pad1(o[:, 2], 0.0)
    dx = pad1(d[:, 0], 0.0)
    dy = pad1(d[:, 1], 0.0)
    dz = pad1(d[:, 2], 1.0)
    tm = pad1(jnp.minimum(tmax, _BIG), -1.0)
    tr = pad1(thr[:, 0], 0.0)
    tg = pad1(thr[:, 1], 0.0)
    tb = pad1(thr[:, 2], 0.0)
    total = ox.shape[0]
    n_mats = aux.shape[0] - (1 + n_lights + n_spheres + n_tris)

    if use_wide is None:
        use_wide = packed.wide is not None
    use_wide = bool(use_wide) and packed.wide is not None
    arity = packed.wide.shape[1] // 8 if use_wide else 0
    nodes = packed.wide if use_wide else packed.nodes
    stack_n = STACK_WIDE if use_wide else STACK_BIN
    if tri_isect == "bw":
        if packed.tris_bw is None:
            raise ValueError("tri_isect='bw' needs PackedBVH.tris_bw — "
                             "build via prepare_bvh (pack_bw)")
        if not use_wide:
            raise ValueError("tri_isect='bw' is implemented for the wide "
                             "walks only (bvh_arity >= 2)")
    tris_block = packed.tris_bw if tri_isect == "bw" else packed.tris

    grid = (total // tile_r,)
    tile = pl.BlockSpec((tile_r,), lambda i: (i,), memory_space=pltpu.VMEM)
    rep = lambda *shape: pl.BlockSpec(
        shape, (lambda i: tuple(0 for _ in shape)),
        memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)

    n_out = (13 + (10 if fork else 0) + (6 if record else 0)
             + (n_lights if record_soft else 0))
    outs = pl.pallas_call(
        functools.partial(_kernel, n_lights=n_lights, n_spheres=n_spheres,
                          n_tris=n_tris, n_mats=n_mats,
                          max_bounces=max_bounces, arity=arity,
                          fuse=fuse_shadows, record=record,
                          unroll=walk_unroll, occ_mode=occ_mode,
                          leaf_rows=packed.rows_per_leaf,
                          light_cull=light_cull, tri_isect=tri_isect,
                          bw_rows=packed.bw_rows_per_leaf,
                          record_soft=record_soft,
                          shadow_batch=shadow_batch, dbg=dbg,
                          fork=fork, has_mesh=has_mesh,
                          stale_prune=stale_prune, near_mode=near_mode),
        grid=grid,
        in_specs=[smem1,
                  tile, tile, tile, tile, tile, tile, tile,
                  tile, tile, tile,
                  rep(*nodes.shape), rep(*tris_block.shape),
                  rep(*packed.leafmeta.shape), rep(*aux.shape)],
        out_specs=tuple([tile] * n_out),
        out_shape=tuple([jax.ShapeDtypeStruct((total,), jnp.float32)]
                        * n_out),
        scratch_shapes=[
            # batched per-light walks keep L disjoint 256-entry stack
            # regions in the one scratch array (few KB of SMEM)
            pltpu.SMEM((stack_n * (max(n_lights, 1) if shadow_batch
                                   else 1),), jnp.int32),
            pltpu.SMEM((stack_n * (max(n_lights, 1) if shadow_batch
                                   else 1),), jnp.float32)],
        # resident blocks total ~21MB with 128-lane padding (nodes 10.7 +
        # tris 5.3 + leafmeta 5.3): above Mosaic's conservative 16MB
        # default scoped-vmem limit, well under the chip's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(depth, jnp.int32).reshape(1), ox, oy, oz, dx, dy, dz,
      tm, tr, tg, tb, nodes, tris_block, packed.leafmeta, aux)

    (dr, dg, db, oxo, oyo, ozo, dxo, dyo, dzo, tmo, tro, tgo,
     tbo) = outs[:13]
    cut = lambda x: jax.lax.stop_gradient(x[:n])
    delta = jnp.stack([cut(dr), cut(dg), cut(db)], axis=-1)
    o2 = jnp.stack([cut(oxo), cut(oyo), cut(ozo)], axis=-1)
    d2 = jnp.stack([cut(dxo), cut(dyo), cut(dzo)], axis=-1)
    thr2 = jnp.stack([cut(tro), cut(tgo), cut(tbo)], axis=-1)
    base = (delta, o2, d2, thr2, cut(tmo))
    if fork:
        (txo, tyo, tzo, tdx, tdy, tdz, twr, twg, twb, ttm) = outs[13:23]
        o3 = jnp.stack([cut(txo), cut(tyo), cut(tzo)], axis=-1)
        d3 = jnp.stack([cut(tdx), cut(tdy), cut(tdz)], axis=-1)
        w3 = jnp.stack([cut(twr), cut(twg), cut(twb)], axis=-1)
        return base + (o3, d3, w3, cut(ttm))
    if not record:
        return base
    rt, rnx, rny, rnz, rmat, rocc = outs[13:19]
    rec = (cut(rt), jnp.stack([cut(rnx), cut(rny), cut(rnz)], axis=-1),
           cut(rmat), cut(rocc))
    if record_soft:
        st = (jnp.stack([cut(s) for s in outs[19:19 + n_lights]], axis=-1)
              if n_lights else jnp.zeros((n, 0), jnp.float32))
        rec = rec + (st,)
    return base + (rec,)
