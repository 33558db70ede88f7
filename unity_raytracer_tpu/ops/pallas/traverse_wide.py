"""Packet traversal v5: WIDE (BVH4/8) node rows — fewer, fatter loop steps.

The measured bottleneck of the binary packet kernels (docs/KERNELS.md) is
per-iteration serialization: each ``while_loop`` step costs ~1 µs of scalar
loads / `lax.cond` / loop overhead against ~0.1 µs of useful vector work,
and a binary tree walk needs ~62 steps per tile on the flagship scene.
This kernel collapses the binary SAH tree into an ``arity``-wide tree
(children = grandchildren of the binary tree, widest-box-first) so one
step tests ``arity`` child boxes: a 4-wide tree has one third the interior
nodes of the binary tree, cutting steps per walk ~2.5x at roughly constant
per-step overhead.

Layout — ``wide [Nw, 8*arity] f32``, one VMEM row per wide node; child
slot c occupies lanes [8c, 8c+8):

  +0..2 box min   +3..5 box max
  +6    meta: interior -> wide row of the child; leaf -> tris row
  +7    count: 0 interior, >0 leaf triangle count, -1 absent slot

Leaf rows are UNCHANGED from the mk3 packed layout (``tris [n_leaves,128]``,
``leafmeta``): collapsing only merges interior structure, so `widen` is a
pure addition on top of `pack_rows` and the epilogue (leaf_prim mapping,
differentiable-t re-derivation) is shared with mk3/mk4.

Traversal: per-tile scalar stack of encoded entries (interior child ->
wide row; leaf child -> ``-(tris_row + 2)``; ``-1`` = empty). Each step
pops one entry; a leaf entry runs the 14-triangle unrolled tests, an
interior entry slab-tests its ``arity`` child boxes against the packet,
sorts the hits by packet entry distance (static compare-exchange network
on scalars) and pushes them far-to-near so the nearest child pops first.
Popping skips stale entries (recorded entry distance > max best_t) —
the same conservative scalar prune as traverse_mk4.

Same calling convention and semantics as traverse_packet3/4, including
``t_max`` lane culls (< 0) and ``any_hit`` occlusion mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unity_raytracer_tpu.ops.pallas.traverse_mk3 import (
    _BIG, EPS, PALLAS_LEAF, TILE_R, PackedBVH)

# up to (arity-1) residual pushes per tree level (the nearest child pops
# straight back off); wide-tree depth <= the binary ~25-30, so 256 is ample
STACK = 256

DEFAULT_ARITY = 4
_INF = float("inf")  # python scalar: weak-typed inside the kernel, not a
#                      captured traced constant (pallas_call rejects those)


def sort_network(w: int):
    """Static compare-exchange network sorting w scalars ascending
    (insertion network: w(w-1)/2 exchanges — scalar ops, cost is noise
    next to the packet slab tests)."""
    return [(j - 1, j) for i in range(1, w) for j in range(i, 0, -1)]


def wide_expand(nodes_ref, stack_ref, stack_tn_ref, node, sp, expand,
                rays, arity, ordered=True):
    """Shared wide-node interior step: packet slab-test all ``arity``
    child boxes of ``node`` against every ray set in ``rays`` (a list of
    ``(ox, oy, oz, inv_x, inv_y, inv_z, best_t)`` tuples — one per fused
    query, e.g. one per light for the fused shadow walk) and push the hit
    children (leaf children encoded as ``-(tris_row+2)``).

    ``ordered`` selects the push discipline:
    * ``True`` / ``'sort'`` — hits sorted by packet entry distance
      (static compare-exchange network), pushed far-to-near so the
      nearest child pops first; entry distance recorded for the
      stale-pop prune. The nearest-walk default.
    * ``'keys'`` — real entry distances recorded (prune stays fully
      effective) but the sort network is skipped; pop order is child
      slot order. For any-hit walks where the prune matters (lanes
      retire, cur_max drops) but strict near-first order may not.
    * ``False`` / ``'none'`` — keys recorded as 0.0: no sort, prune
      only fires once every lane has retired (cheapest per step, most
      steps). The sort-vs-keys-vs-none trade for occlusion walks is an
      empirical question (cfg.occ_mode) settled by the r3 sweep.
    * ``'pack'`` — 'none' with the per-child any-lane-hit tests packed
      into int32 bitfield SUMS: 2 cross-lane reductions decide all 4
      children instead of one min-reduction each (reductions, not
      flops, are the measured per-step cost driver — r3/r5
      decompositions). Single-ray-set walks only; falls back to 'none'
      for fused multi-set walks.

    Cross-lane reductions are the measured per-step cost driver (VPU
    reductions, not flops): the per-set entry distances are combined
    ELEMENTWISE first so each child pays ONE cross-lane min total, not
    one per ray set. Returns the new stack pointer.
    """
    mode = ("sort" if ordered is True else
            "none" if ordered is False else ordered)
    if mode == "pack" and len(rays) != 1:
        mode = "none"

    if mode == "pack":
        # packed hit decisions: accumulate per-child any-lane-hit as
        # 13-bit count fields of int32 sums (lane counts <= 4096 fit),
        # two children per reduction — halves the per-step cross-lane
        # reduction count vs one min per child. Push keys are 0.0 (no
        # ordering, like 'none'); push decisions are IDENTICAL.
        (ox, oy, oz, inv_x, inv_y, inv_z, best_t) = rays[0]
        lane_hits = []
        encs = []
        for cslot in range(arity):
            b = 8 * cslot
            lx = nodes_ref[node, b]
            ly = nodes_ref[node, b + 1]
            lz = nodes_ref[node, b + 2]
            hx = nodes_ref[node, b + 3]
            hy = nodes_ref[node, b + 4]
            hz = nodes_ref[node, b + 5]
            meta = nodes_ref[node, b + 6].astype(jnp.int32)
            cnt = nodes_ref[node, b + 7]
            t1 = (lx - ox) * inv_x
            t2 = (hx - ox) * inv_x
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            t1 = (ly - oy) * inv_y
            t2 = (hy - oy) * inv_y
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            t1 = (lz - oz) * inv_z
            t2 = (hz - oz) * inv_z
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            tn = jnp.maximum(tn, 0.0)
            lane_hit = (tn <= tf) & (tn <= best_t)
            # absent/scalar gates fold into the scalar push predicate
            lane_hits.append((lane_hit.astype(jnp.int32), cnt >= 0.0))
            encs.append(jnp.where(cnt > 0.0, -(meta + 2), meta))
        hit_cs = []
        for i in range(0, arity, 2):
            a = lane_hits[i][0]
            packv = (a + (lane_hits[i + 1][0] << 13)
                     if i + 1 < arity else a)
            s = jnp.sum(packv)
            hit_cs.append((s & 0x1FFF) > 0)
            if i + 1 < arity:
                hit_cs.append((s >> 13) > 0)
        for i in range(arity - 1, -1, -1):
            h = hit_cs[i] & expand & lane_hits[i][1]

            @pl.when(h)
            def _(i=i, sp=sp):
                stack_ref[sp] = encs[i]
                stack_tn_ref[sp] = 0.0
            sp = jnp.where(h, sp + 1, sp)
        return sp

    keys = []
    encs = []
    for cslot in range(arity):
        b = 8 * cslot
        lx = nodes_ref[node, b]
        ly = nodes_ref[node, b + 1]
        lz = nodes_ref[node, b + 2]
        hx = nodes_ref[node, b + 3]
        hy = nodes_ref[node, b + 4]
        hz = nodes_ref[node, b + 5]
        meta = nodes_ref[node, b + 6].astype(jnp.int32)
        cnt = nodes_ref[node, b + 7]
        tn_all = None  # elementwise min over ray sets of masked entry t
        for (ox, oy, oz, inv_x, inv_y, inv_z, best_t) in rays:
            t1 = (lx - ox) * inv_x
            t2 = (hx - ox) * inv_x
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            t1 = (ly - oy) * inv_y
            t2 = (hy - oy) * inv_y
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            t1 = (lz - oz) * inv_z
            t2 = (hz - oz) * inv_z
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
            tn = jnp.maximum(tn, 0.0)
            lane_hit = (tn <= tf) & (tn <= best_t)
            masked = jnp.where(lane_hit, tn, _BIG)
            tn_all = masked if tn_all is None else jnp.minimum(tn_all,
                                                               masked)
        key = jnp.min(tn_all)  # the ONE cross-lane reduction per child
        hit_c = (key < _BIG) & expand & (cnt >= 0.0)
        keys.append(jnp.where(hit_c, 0.0 if mode == "none" else key,
                              _INF))
        encs.append(jnp.where(cnt > 0.0, -(meta + 2), meta))

    if mode == "sort":
        for (i, j) in sort_network(arity):
            swap = keys[i] > keys[j]
            ki = jnp.where(swap, keys[j], keys[i])
            kj = jnp.where(swap, keys[i], keys[j])
            ei = jnp.where(swap, encs[j], encs[i])
            ej = jnp.where(swap, encs[i], encs[j])
            keys[i], keys[j], encs[i], encs[j] = ki, kj, ei, ej

    # far-to-near push; after the sort, hits (finite key) form a prefix,
    # so sp stays compact (unordered: prefix property is irrelevant)
    for i in range(arity - 1, -1, -1):
        h = jnp.isfinite(keys[i])

        @pl.when(h)
        def _(i=i, sp=sp):
            stack_ref[sp] = encs[i]
            stack_tn_ref[sp] = keys[i]
        sp = jnp.where(h, sp + 1, sp)
    return sp


def wide_pop(stack_ref, stack_tn_ref, sp, cur_max, base=0, prune=True):
    """Pop the top stack entry, first dropping entries whose recorded
    entry distance can no longer beat any lane (traverse_mk4's prune).
    Returns (cursor, sp); cursor == -1 means the stack is exhausted.

    ``base``: lowest valid stack index — lets several independent walks
    share one SMEM scratch array at disjoint offsets (the batched
    per-light shadow walk gives each light a 256-entry region).
    ``prune=False`` skips the stale-entry drop loop (step-overhead
    decomposition instrumentation)."""
    if prune:
        def pop_cond(s):
            sp_, _ = s
            stale = stack_tn_ref[jnp.maximum(sp_ - 1, 0)] > cur_max
            return (sp_ > base) & stale

        sp, _ = jax.lax.while_loop(pop_cond, lambda s: (s[0] - 1, s[1]),
                                   (sp, jnp.int32(0)))
    has = sp > base
    cursor = jnp.where(has, stack_ref[jnp.maximum(sp - 1, 0)],
                       jnp.int32(-1))
    sp = jnp.where(has, sp - 1, sp)
    return cursor, sp


def widen(packed: PackedBVH, arity: int = DEFAULT_ARITY) -> PackedBVH:
    """Host-side collapse of the packed binary tree into an arity-wide
    tree (numpy). Returns ``packed`` with the ``wide`` field filled.

    Collapse rule: start from a binary interior node's two children and
    repeatedly replace the largest-surface-area interior child with its
    own two children until ``arity`` slots are filled or all children are
    leaves — the standard BVH4/8 collapse, biased to split big boxes
    (they are the ones rays hit most).
    """
    import sys

    if arity < 2:
        # binary walks (bvh_arity=0/1): no wide collapse — leave
        # packed.wide as None; trace_segment/traverse_any route the
        # mk3/mk4 binary layout when wide is absent
        return packed

    nodes = np.asarray(packed.nodes)
    nmin = nodes[:, 0:3]
    nmax = nodes[:, 3:6]
    leaf_id = nodes[:, 6].astype(np.int64)
    count = nodes[:, 7].astype(np.int64)
    right = nodes[:, 9].astype(np.int64)
    is_leaf = count > 0

    def area(k):
        d = np.maximum(nmax[k] - nmin[k], 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    def collapse_children(b):
        kids = [b + 1, int(right[b])]
        while len(kids) < arity:
            best, best_a = -1, -1.0
            for i, k in enumerate(kids):
                if not is_leaf[k] and area(k) > best_a:
                    best, best_a = i, area(k)
            if best < 0:
                break
            k = kids.pop(best)
            kids += [k + 1, int(right[k])]
        return kids

    rows: list[list[int]] = []
    widx: dict[int, int] = {}
    depth = [0]  # max wide-tree depth, for the stack-capacity check
    if is_leaf[0]:
        rows.append([0])  # degenerate: root is a single leaf
    else:
        sys.setrecursionlimit(200_000)

        def assign(b, lvl=1):
            widx[b] = len(rows)
            rows.append([])
            kids = collapse_children(b)
            rows[widx[b]] = kids
            depth[0] = max(depth[0], lvl)
            for k in kids:
                if not is_leaf[k]:
                    assign(k, lvl + 1)

        assign(0)

    # the traversal pushes at most (arity-1) residual entries per level
    # plus arity at the deepest expansion; the kernels keep the SMEM
    # stack unguarded, so a pathological tree must fail HERE, host-side
    need = (arity - 1) * depth[0] + arity
    if need > STACK:
        raise ValueError(
            f"wide-tree depth {depth[0]} needs stack {need} > {STACK}; "
            "tree is pathologically deep — rebuild with a larger leaf "
            "size or raise STACK")

    out = np.zeros((len(rows), 8 * arity), np.float32)
    out[:, 7::8] = -1.0  # absent slots
    for r, kids in enumerate(rows):
        for c, k in enumerate(kids):
            b0 = 8 * c
            out[r, b0:b0 + 3] = nmin[k]
            out[r, b0 + 3:b0 + 6] = nmax[k]
            if is_leaf[k]:
                out[r, b0 + 6] = float(leaf_id[k])
                out[r, b0 + 7] = float(count[k])
            else:
                out[r, b0 + 6] = float(widx[k])
                out[r, b0 + 7] = 0.0
    return packed._replace(wide=jnp.asarray(out))


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            wide_ref, tris_ref, t_out_ref, slot_out_ref, leaf_out_ref,
            stack_ref, stack_tn_ref, *, arity: int, any_hit: bool = False,
            unroll: int = 1, leaf_rows: int = 1):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    tiny = 1e-30
    fix = lambda v: jnp.where(jnp.abs(v) < tiny,
                              jnp.where(v < 0, -tiny, tiny), v)
    inv_dx = 1.0 / fix(dx)
    inv_dy = 1.0 / fix(dy)
    inv_dz = 1.0 / fix(dz)

    if any_hit:
        def cond(c):
            return (c[0] != -1) & jnp.any(c[2] > 0.0)
    else:
        def cond(c):
            return c[0] != -1

    def body(c):
        cursor, sp, best_t, best_slot, best_leaf = c
        # ---- leaf entry: unrolled triangle tests ------------------------
        is_leafe = cursor < -1
        leaf_row = jnp.maximum(-cursor - 2, 0)

        def leaf_tests(args):
            best_t, best_slot, best_leaf = args
            for rr, k in [(r_, k_) for r_ in range(leaf_rows)
                          for k_ in range(PALLAS_LEAF)]:
                row = leaf_row + rr
                b = 9 * k
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
                # degenerate pad slots (all-zero verts) reject via det/u/v —
                # no explicit count here: absent slots are zero triangles
                good = (~par & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                        & (u + v <= 1.0) & (t > EPS))
                upd = good & (t < best_t)
                best_t = jnp.where(upd, -1.0 if any_hit else t, best_t)
                best_slot = jnp.where(upd, k, best_slot)
                best_leaf = jnp.where(upd, row, best_leaf)
            return best_t, best_slot, best_leaf

        best_t, best_slot, best_leaf = jax.lax.cond(
            is_leafe, leaf_tests, lambda a: a,
            (best_t, best_slot, best_leaf))

        # ---- interior entry: shared wide expand + stale-pruned pop ------
        # ('sort' also for any-hit: near-first order retires lanes
        # sooner and the prune then empties the stack; see wide_expand)
        node = jnp.maximum(cursor, 0)
        sp = wide_expand(wide_ref, stack_ref, stack_tn_ref, node, sp,
                         cursor >= 0,
                         [(ox, oy, oz, inv_dx, inv_dy, inv_dz, best_t)],
                         arity, ordered=True)
        cursor, sp = wide_pop(stack_ref, stack_tn_ref, sp,
                              jnp.max(best_t))
        return cursor, sp, best_t, best_slot, best_leaf

    if unroll > 1:
        # the body is a no-op at cursor == -1, so iterations compose
        body1 = body

        def body(c):
            for _ in range(unroll):
                c = body1(c)
            return c

    best_t0 = tmax_ref[:]
    slot0 = jnp.full(best_t0.shape, -1, jnp.int32)
    leaf0 = jnp.full(best_t0.shape, -1, jnp.int32)
    _, _, best_t, best_slot, best_leaf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), best_t0, slot0, leaf0))

    t_out_ref[:] = best_t
    slot_out_ref[:] = best_slot
    leaf_out_ref[:] = best_leaf


def traverse_wide(packed: PackedBVH, o: jnp.ndarray, d: jnp.ndarray,
                  t_max: jnp.ndarray | None = None,
                  interpret: bool = False,
                  any_hit: bool = False,
                  tile_r: int = TILE_R,
                  unroll: int = 1
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Wide-node twin of traverse_packet3/4 (requires ``packed.wide``)."""
    if packed.wide is None:
        raise ValueError("PackedBVH.wide missing — call widen() first")
    arity = packed.wide.shape[1] // 8
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

    sg = jax.lax.stop_gradient
    t_out, slot_out, leaf_out = pl.pallas_call(
        functools.partial(_kernel, arity=arity, any_hit=any_hit,
                          unroll=unroll,
                          leaf_rows=packed.rows_per_leaf),
        grid=grid,
        in_specs=[tile, tile, tile, tile, tile, tile, tile,
                  rep(*packed.wide.shape), rep(*packed.tris.shape)],
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
      sg(packed.wide), sg(packed.tris))

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
