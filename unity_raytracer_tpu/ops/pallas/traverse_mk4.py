"""Packet traversal v4: ORDERED near-child-first descent with an SMEM stack.

mk3 walks the threaded (leftmost-DFS + miss-link) order, which visits left
subtrees even when the right child is closer along the ray; nearest-hit
queries then shrink ``best_t`` late and prune little. v4 keeps mk3's packed
row layout (see traverse_mk3.pack_rows — lane 9 carries the right-child
index) but descends into the child whose packet entry distance is smaller
and pushes the farther child onto a scalar stack in SMEM. Each stack entry
also records the pushed subtree's minimum entry distance so stale entries
(no lane can improve) are dropped on pop.

Every visited node re-tests its own box against the CURRENT ``best_t``
vector, so subtrees pushed before a closer hit was found still prune.

The stack is per-TILE (all 1024 lanes share one traversal order), which is
what makes a scalar SMEM stack possible — per-lane stacks don't vectorize
on the VPU.

Same calling convention and semantics as traverse_mk3.traverse_packet3,
including ``t_max`` lane culls (< 0) and ``any_hit`` occlusion mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unity_raytracer_tpu.ops.pallas.traverse_mk3 import (
    _BIG, EPS, PALLAS_LEAF, TILE_R, PackedBVH)

STACK = 96  # >= max tree depth (SAH over 100k tris is ~25; 96 is ample)


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            nodes_ref, tris_ref, t_out_ref, slot_out_ref, leaf_out_ref,
            stack_ref, stack_tn_ref, *, any_hit: bool = False,
            leaf_rows: int = 1):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    tiny = 1e-30
    fix = lambda v: jnp.where(jnp.abs(v) < tiny,
                              jnp.where(v < 0, -tiny, tiny), v)
    inv_dx = 1.0 / fix(dx)
    inv_dy = 1.0 / fix(dy)
    inv_dz = 1.0 / fix(dz)

    def box_test(row, best_t):
        """Packet slab test vs node row. Returns (any_lane, tn_min_scalar)."""
        lx = nodes_ref[row, 0]
        ly = nodes_ref[row, 1]
        lz = nodes_ref[row, 2]
        hx = nodes_ref[row, 3]
        hy = nodes_ref[row, 4]
        hz = nodes_ref[row, 5]
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
        lane_hit = (tn <= tf) & (tn <= best_t)
        tn_min = jnp.min(jnp.where(lane_hit, tn, _BIG))
        return jnp.any(lane_hit), tn_min

    if any_hit:
        def cond(c):
            return (c[0] >= 0) & jnp.any(c[2] > 0.0)
    else:
        def cond(c):
            return c[0] >= 0

    def body(c):
        cursor, sp, best_t, best_slot, best_leaf = c
        any_lane, _ = box_test(cursor, best_t)
        leaf_row = nodes_ref[cursor, 6].astype(jnp.int32)
        count = nodes_ref[cursor, 7].astype(jnp.int32)
        right = nodes_ref[cursor, 9].astype(jnp.int32)
        is_leaf = count > 0

        def leaf_tests(args):
            best_t, best_slot, best_leaf = args
            for rr, k in [(r_, k_) for r_ in range(leaf_rows)
                          for k_ in range(PALLAS_LEAF)]:
                row = leaf_row + rr
                b = 9 * k
                ok = (rr * PALLAS_LEAF + k) < count
                v0x = tris_ref[row, b]
                v0y = tris_ref[row, b + 1]
                v0z = tris_ref[row, b + 2]
                e1x = tris_ref[row, b + 3] - v0x
                e1y = tris_ref[row, b + 4] - v0y
                e1z = tris_ref[row, b + 5] - v0z
                e2x = tris_ref[row, b + 6] - v0x
                e2y = tris_ref[row, b + 7] - v0y
                e2z = tris_ref[row, b + 8] - v0z
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                par = jnp.abs(det) < EPS
                f = 1.0 / jnp.where(par, 1.0, det)
                sx = ox - v0x
                sy = oy - v0y
                sz = oz - v0z
                u = f * (sx * px + sy * py + sz * pz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (dx * qx + dy * qy + dz * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)
                good = (~par & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                        & (u + v <= 1.0) & (t > EPS) & ok)
                upd = good & (t < best_t)
                best_t = jnp.where(upd, -1.0 if any_hit else t, best_t)
                best_slot = jnp.where(upd, k, best_slot)
                best_leaf = jnp.where(upd, row, best_leaf)
            return best_t, best_slot, best_leaf

        best_t, best_slot, best_leaf = jax.lax.cond(
            is_leaf & any_lane, leaf_tests, lambda a: a,
            (best_t, best_slot, best_leaf))

        # interior + hit: order the children by packet entry distance
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
        one = hit_l ^ hit_r
        descend = both | one

        # push the far child (with its entry distance) when both hit
        @pl.when(both)
        def _():
            stack_ref[sp] = far
            stack_tn_ref[sp] = far_tn
        sp = jnp.where(both, sp + 1, sp)

        # pop: drop entries whose recorded entry distance can no longer
        # beat any lane's best (conservative scalar prune)
        cur_max = jnp.max(best_t)

        def pop_cond(s):
            sp_, cur_ = s
            stale = stack_tn_ref[jnp.maximum(sp_ - 1, 0)] > cur_max
            return (cur_ < 0) & (sp_ > 0) & stale

        def pop_body(s):
            sp_, cur_ = s
            return sp_ - 1, cur_

        cursor = jnp.where(descend, near, -1)
        sp, cursor = jax.lax.while_loop(pop_cond, pop_body, (sp, cursor))
        do_pop = (cursor < 0) & (sp > 0)
        cursor = jnp.where(do_pop, stack_ref[jnp.maximum(sp - 1, 0)], cursor)
        sp = jnp.where(do_pop, sp - 1, sp)
        return cursor, sp, best_t, best_slot, best_leaf

    best_t0 = tmax_ref[:]
    slot0 = jnp.full(best_t0.shape, -1, jnp.int32)
    leaf0 = jnp.full(best_t0.shape, -1, jnp.int32)
    _, _, best_t, best_slot, best_leaf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), best_t0, slot0, leaf0))

    t_out_ref[:] = best_t
    slot_out_ref[:] = best_slot
    leaf_out_ref[:] = best_leaf


def traverse_packet4(packed: PackedBVH, o: jnp.ndarray, d: jnp.ndarray,
                     t_max: jnp.ndarray | None = None,
                     interpret: bool = False,
                     any_hit: bool = False,
                     tile_r: int = TILE_R
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ordered-traversal twin of traverse_mk3.traverse_packet3."""
    bvh = packed.bvh
    n = o.shape[0]
    n_pad = (-n) % tile_r
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), o.dtype)], 0)
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype),
                         (n_pad, 1))], 0)
    total = o.shape[0]
    if t_max is None:
        tmax = jnp.full((total,), _BIG, jnp.float32)
        if n_pad:
            tmax = tmax.at[n:].set(-1.0)
    else:
        tm = jnp.minimum(jnp.asarray(t_max, jnp.float32), _BIG)
        tmax = (jnp.concatenate([tm, jnp.full((n_pad,), -1.0, jnp.float32)],
                                0) if n_pad else tm)

    grid = (total // tile_r,)
    rep = lambda *shape: pl.BlockSpec(
        shape, (lambda i: tuple(0 for _ in shape)),
        memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((tile_r,), lambda i: (i,), memory_space=pltpu.VMEM)

    # cut gradients at the kernel inputs (no JVP rule for pallas_call;
    # traversal is index logic) — differentiable t re-derived below
    sg = jax.lax.stop_gradient
    t_out, slot_out, leaf_out = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit,
                          leaf_rows=packed.rows_per_leaf),
        grid=grid,
        in_specs=[tile, tile, tile, tile, tile, tile, tile,
                  rep(*packed.nodes.shape), rep(*packed.tris.shape)],
        out_specs=(tile, tile, tile),
        out_shape=(
            jax.ShapeDtypeStruct((total,), jnp.float32),
            jax.ShapeDtypeStruct((total,), jnp.int32),
            jax.ShapeDtypeStruct((total,), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((STACK,), jnp.int32),
                        pltpu.SMEM((STACK,), jnp.float32)],
        interpret=interpret,
    )(sg(o[:, 0]), sg(o[:, 1]), sg(o[:, 2]),
      sg(d[:, 0]), sg(d[:, 1]), sg(d[:, 2]), sg(tmax),
      sg(packed.nodes), sg(packed.tris))

    t_out = jax.lax.stop_gradient(t_out[:n])
    slot_out = slot_out[:n]
    leaf_out = leaf_out[:n]
    hit = slot_out >= 0
    row = jnp.where(
        hit,
        packed.leaf_prim[jnp.clip(leaf_out, 0, None),
                         jnp.clip(slot_out, 0, None)],
        -1)
    orig = jnp.where(hit, jnp.take(bvh.prim_index,
                                   jnp.clip(row, 0, None)), -1)
    from unity_raytracer_tpu.ops.bvh import _mt_one, shading_normal
    tri = jnp.take(bvh.tri_verts, jnp.clip(row, 0, None), axis=0)
    t_diff = _mt_one(o[:n], d[:n], tri[:, 0], tri[:, 1], tri[:, 2])
    t_final = jnp.where(hit,
                        jnp.where(jnp.isfinite(t_diff), t_diff, t_out),
                        jnp.inf)
    return t_final, orig.astype(jnp.int32), shading_normal(tri)
