"""Packet traversal v3: packed-row layout — 100k tris in VMEM, using only
the access pattern Mosaic compiles (dynamic sublane row read, static lanes).

Empirics from the axon TPU backend:
* dynamic scalar loads with a *dynamic sublane, static lane* index compile
  and run (traverse_mk) — but one VMEM row per 3-10 useful floats pads the
  lane dim to 128 and costs ``rows x 512B``: 33-52 MB at 100k tris;
* dynamic *lane* indexing (traverse_mk2) crashes the remote compile helper.

v3 packs data so each dynamic row read yields a full useful record:
* ``nodes [Nn, 16] f32`` — lanes 0-5 box min/max, lanes 6-8 bitcast int32
  (leaf row / count, interior -1 / miss_next). One row per node:
  14.6k nodes (leaf_size 14) = 7.5 MB.
* ``tris [n_leaves, 128] f32`` — one row per LEAF, up to 14 triangles at
  lanes [9k, 9k+9). 7.3k leaves = 3.7 MB.

A leaf visit is one dynamic row read + 14 static-lane unrolled tests over
the ray tile. Build the BVH with ``leaf_size=PALLAS_LEAF`` for this path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unity_raytracer_tpu.ops.bvh import MeshBVH

EPS = 1e-5
_BIG = 3.0e38

TILE_R = 1024
PALLAS_LEAF = 14  # 14 tris x 9 floats = 126 lanes <= 128


class PackedBVH(NamedTuple):
    nodes: jnp.ndarray      # [Nn, 16] f32 (6 box + 3 bitcast i32 + pad)
    tris: jnp.ndarray       # [n_leaves*rpl, 128] f32 (rpl rows per leaf)
    leaf_prim: jnp.ndarray  # [n_leaves*rpl, 14] i32 row slot -> tri row
    bvh: MeshBVH            # original (for prim_index / tri_verts)
    # [n_leaves*rpl, 16] f32 combined-material-table id per row slot
    # (exact small ints) — consumed by the fused segment megakernel
    # (ops/pallas/mega.py); built by ops/bvh.prepare_bvh (needs the scene)
    leafmeta: jnp.ndarray | None = None
    # [Nw, 8*arity] f32 wide (BVH4/8) interior rows — built by
    # traverse_wide.widen on top of this packed layout; leaf rows are
    # shared. Consumed by traverse_wide + the wide megakernel walks.
    wide: jnp.ndarray | None = None
    # shape tag: rows per leaf = leaf_tag.shape[0] (shapes are static
    # under jit, so kernels can unroll it; a plain int field would
    # flatten into a traced pytree leaf)
    leaf_tag: jnp.ndarray | None = None
    # [n_leaves*bw_rpl, 128] f32 Baldwin–Weber precomputed triangle
    # records, 10 per row x 12 floats: unit plane normal (= the bake
    # shading normal), plane offset, and the two affine barycentric
    # rows — ~1.8x fewer vector ops per leaf test than Möller–Trumbore
    # from raw verts. Built by pack_bw; consumed by the megakernel when
    # cfg.tri_isect == 'bw'.
    tris_bw: jnp.ndarray | None = None
    bw_tag: jnp.ndarray | None = None  # shape tag: bw rows per leaf

    @property
    def rows_per_leaf(self) -> int:
        return 1 if self.leaf_tag is None else self.leaf_tag.shape[0]

    @property
    def bw_rows_per_leaf(self) -> int:
        return 0 if self.bw_tag is None else self.bw_tag.shape[0]


def pack_rows(bvh: MeshBVH, leaf_slots: int = PALLAS_LEAF) -> PackedBVH:
    """Host-side repack (numpy). Requires every leaf count <=
    ``leaf_slots``. Leaves wider than PALLAS_LEAF span CONSECUTIVE
    128-lane rows (rows stay 128 lanes — Mosaic's dynamic-sublane +
    static-lane scalar loads only reach the first register; 256-lane
    rows crash the native compiler, measured r3). ``nodes`` leaf ids
    point at the FIRST row; ``leaf_tag.shape[0]`` carries the static
    rows-per-leaf count for the kernels' unrolled row loop."""
    first = np.asarray(bvh.first)
    count = np.asarray(bvh.count)
    miss = np.asarray(bvh.miss_next)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    tv = np.asarray(bvh.tri_verts).reshape(-1, 9)
    nn = first.shape[0]
    if count.max(initial=0) > leaf_slots:
        raise ValueError(
            f"leaf size {count.max()} > {leaf_slots}; build the BVH with "
            f"leaf_size={leaf_slots} for the pallas path")

    is_leaf = count > 0
    leaf_ids = np.cumsum(is_leaf) - 1          # node -> leaf id
    n_leaves = int(is_leaf.sum())
    rpl = -(-leaf_slots // PALLAS_LEAF)        # rows per leaf

    rows = max(n_leaves, 1) * rpl
    tris = np.zeros((rows, 128), np.float32)
    leaf_prim = np.full((rows, PALLAS_LEAF), -1, np.int32)
    leaf_nodes = np.nonzero(is_leaf)[0]
    for r, node in enumerate(leaf_nodes):
        f0, c = first[node], count[node]
        for k in range(c):
            rr, kk = divmod(k, PALLAS_LEAF)
            tris[r * rpl + rr, 9 * kk: 9 * kk + 9] = tv[f0 + k]
            leaf_prim[r * rpl + rr, kk] = f0 + k

    # meta stored as float VALUES (exact integers below 2^24 — node/leaf
    # counts are far below); Mosaic has no scalar bitcast, and float
    # compare/convert of small ints is exact
    nodes = np.zeros((nn, 16), np.float32)
    nodes[:, 0:3] = nmin
    nodes[:, 3:6] = nmax
    nodes[:, 6] = np.where(is_leaf, leaf_ids * rpl, -1).astype(np.float32)
    nodes[:, 7] = count.astype(np.float32)
    nodes[:, 8] = miss.astype(np.float32)
    # lane 9: right-child index for interior nodes (-1 for leaves). DFS
    # pre-order ⇒ left child = i+1 and left's miss link IS the right
    # sibling, so no builder change is needed. Consumed by the ordered
    # (near-child-first) traversal in traverse_mk4.
    right = np.full(nn, -1, np.int64)
    interior = ~is_leaf
    if nn > 1:
        right[interior] = miss[np.nonzero(interior)[0] + 1]
    nodes[:, 9] = right.astype(np.float32)

    return PackedBVH(nodes=jnp.asarray(nodes), tris=jnp.asarray(tris),
                     leaf_prim=jnp.asarray(leaf_prim), bvh=bvh,
                     leaf_tag=jnp.zeros((rpl,), jnp.float32))


BW_PER_ROW = 10  # 10 tris x 12 floats = 120 lanes <= 128


def pack_bw(packed: PackedBVH) -> PackedBVH:
    """Host-side Baldwin–Weber repack of the leaf rows (numpy).

    Per triangle, precompute the 12-float record ``(n̂, d̂, a, a0, b, b0)``:
    ``n̂`` the unit geometric plane normal — which under the canonical
    winding (bvh.canonical_winding) equals the reference's baked shading
    normal (SceneMesh.cs:43), so the nearest walk gets its normal for
    free; ``d̂ = n̂·v0``; and the affine barycentric rows
    ``u(p) = a·p + a0``, ``v(p) = b·p + b0`` solving
    ``a ⟂ {e2, n}, a·e1 = 1`` (Baldwin & Weber, JCGT 2016 — public
    method, derived independently here).

    In-kernel test per triangle: one plane t, one point, two affine dots
    — ~25 vector ops vs Möller–Trumbore-from-verts' ~60. The hit SET
    matches MT up to fp rounding (parity is allclose like everything
    else on the megakernel path). Degenerate / pad slots get all-zero
    records and reject via the |n̂·d| gate.
    """
    tris = np.asarray(packed.tris)
    rpl = packed.rows_per_leaf
    n_rows = tris.shape[0]
    n_leaves = n_rows // rpl
    slots = rpl * PALLAS_LEAF
    # gather all leaf-local slots (zero pads included) -> [n_leaves*slots, 3, 3]
    v9 = np.zeros((n_leaves, slots, 9), np.float32)
    for rr in range(rpl):
        for k in range(PALLAS_LEAF):
            v9[:, rr * PALLAS_LEAF + k] = \
                tris[rr::rpl][:n_leaves, 9 * k: 9 * k + 9]
    v = v9.reshape(-1, 3, 3).astype(np.float64)
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n0 = np.cross(e1, e2)
    n2 = (n0 * n0).sum(-1)
    ok = n2 > 1e-30
    n2s = np.where(ok, n2, 1.0)
    nh = n0 / np.sqrt(n2s)[:, None]
    dh = (nh * v[:, 0]).sum(-1)
    a = np.cross(e2, n0) / n2s[:, None]
    b = np.cross(n0, e1) / n2s[:, None]
    a0 = -(a * v[:, 0]).sum(-1)
    b0 = -(b * v[:, 0]).sum(-1)
    rec = np.concatenate(
        [nh, dh[:, None], a, a0[:, None], b, b0[:, None]],
        axis=-1).astype(np.float32)
    rec[~ok] = 0.0
    rec = rec.reshape(n_leaves, slots, 12)

    bw_rpl = -(-slots // BW_PER_ROW)
    out = np.zeros((max(n_leaves, 1) * bw_rpl, 128), np.float32)
    for j in range(slots):
        rr, kk = divmod(j, BW_PER_ROW)
        out[rr::bw_rpl][:n_leaves, 12 * kk: 12 * kk + 12] = rec[:, j]
    return packed._replace(tris_bw=jnp.asarray(out),
                           bw_tag=jnp.zeros((bw_rpl,), jnp.float32))


def _kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            nodes_ref, tris_ref, t_out_ref, slot_out_ref, leaf_out_ref,
            *, any_hit: bool = False, leaf_rows: int = 1):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    tiny = 1e-30
    fix = lambda v: jnp.where(jnp.abs(v) < tiny,
                              jnp.where(v < 0, -tiny, tiny), v)
    inv_dx = 1.0 / fix(dx)
    inv_dy = 1.0 / fix(dy)
    inv_dz = 1.0 / fix(dz)

    if any_hit:
        # occluded lanes flip best_t to -1; once every lane is either
        # occluded or culled-on-input (t_max < 0) the tile is done
        def cond(c):
            return (c[0] >= 0) & jnp.any(c[1] > 0.0)
    else:
        def cond(c):
            return c[0] >= 0

    def body(c):
        cursor, best_t, best_slot, best_leaf = c
        # per-scalar loads: dynamic sublane + static lane is the one access
        # pattern the Mosaic backend compiles fast (measured)
        lx = nodes_ref[cursor, 0]
        ly = nodes_ref[cursor, 1]
        lz = nodes_ref[cursor, 2]
        hx = nodes_ref[cursor, 3]
        hy = nodes_ref[cursor, 4]
        hz = nodes_ref[cursor, 5]
        leaf_row = nodes_ref[cursor, 6].astype(jnp.int32)
        count = nodes_ref[cursor, 7].astype(jnp.int32)
        miss = nodes_ref[cursor, 8].astype(jnp.int32)

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
        any_lane = jnp.any(lane_hit)

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
                # any-hit: an occluder closer than t_max is final — park the
                # lane at -1 so no later box or leaf test touches it
                best_t = jnp.where(upd, -1.0 if any_hit else t, best_t)
                best_slot = jnp.where(upd, k, best_slot)
                best_leaf = jnp.where(upd, row, best_leaf)
            return best_t, best_slot, best_leaf

        best_t, best_slot, best_leaf = jax.lax.cond(
            is_leaf & any_lane, leaf_tests, lambda a: a,
            (best_t, best_slot, best_leaf))

        descend = any_lane & ~is_leaf
        cursor = jnp.where(descend, cursor + 1, miss)
        return cursor, best_t, best_slot, best_leaf

    best_t0 = tmax_ref[:]
    slot0 = jnp.full(best_t0.shape, -1, jnp.int32)
    leaf0 = jnp.full(best_t0.shape, -1, jnp.int32)
    _, best_t, best_slot, best_leaf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, slot0, leaf0))

    t_out_ref[:] = best_t
    slot_out_ref[:] = best_slot
    leaf_out_ref[:] = best_leaf


def traverse_packet3(packed: PackedBVH, o: jnp.ndarray, d: jnp.ndarray,
                     t_max: jnp.ndarray | None = None,
                     interpret: bool = False,
                     any_hit: bool = False,
                     tile_r: int = TILE_R
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest (or any) mesh hit via the packed-row kernel.

    Returns ``(t [N], original MeshSet row [N])``, +inf / -1 on miss; t is
    re-derived differentiably outside the kernel. ``t_max`` doubles as a
    lane cull: pass a negative value for lanes that should trace nothing.
    With ``any_hit`` the first occluder closer than ``t_max`` finishes the
    lane (t is that occluder's true distance, not the minimum — callers
    use it only for the ``t < light_dist`` occlusion predicate).
    """
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
    else:
        tm = jnp.minimum(jnp.asarray(t_max, jnp.float32), _BIG)
        # pad lanes culled outright (-1): they contribute nothing to the
        # tile's node-visit union
        tmax = (jnp.concatenate([tm, jnp.full((n_pad,), -1.0, jnp.float32)],
                                0) if n_pad else tm)

    grid = (total // tile_r,)
    rep = lambda *shape: pl.BlockSpec(
        shape, (lambda i: tuple(0 for _ in shape)),
        memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((tile_r,), lambda i: (i,), memory_space=pltpu.VMEM)

    # traversal is pure index logic: cut gradients at the kernel INPUTS
    # (pallas_call has no JVP rule; tangents would otherwise flow in via
    # bounce-chain-dependent origins / t_max). The differentiable t is
    # re-derived below from the ORIGINAL (non-stopped) rays.
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
        interpret=interpret,
    )(sg(o[:, 0]), sg(o[:, 1]), sg(o[:, 2]),
      sg(d[:, 0]), sg(d[:, 1]), sg(d[:, 2]), sg(tmax),
      sg(packed.nodes), sg(packed.tris))

    t_out = jax.lax.stop_gradient(t_out[:n])
    slot_out = slot_out[:n]
    leaf_out = leaf_out[:n]
    hit = slot_out >= 0
    # leaf slot -> leaf-order row -> original MeshSet row
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
