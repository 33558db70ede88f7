"""Pallas packet-traversal megakernel: threaded BVH, one cursor per tile.

Why not the XLA while_loop traversal (ops/bvh.py:traverse) on TPU?
1. It is *globally* lockstep: one ray needing 5000 node visits holds every
   other ray in the batch hostage — at millions of lanes the tail dominates.
2. Each iteration gathers node/triangle rows per lane from HBM — the
   worst access pattern the hardware offers.

This kernel flips both properties, the classic packet-tracing shape mapped
onto TPU memory spaces:
* the ENTIRE flat BVH + triangle soup lives in VMEM (at 100k triangles the
  node arrays + 9-float triangle rows total ~6 MB < 16 MB VMEM);
* rays are tiled (TILE_R per grid step); each tile runs its own traversal
  loop with a SINGLE scalar cursor — node data loads are *scalar* reads
  broadcast to the lanes, so there are no vector gathers at all;
* a tile descends into a subtree iff ANY of its (coherent) rays hits the
  node box and could improve its best-t; leaves test LEAF_SIZE triangles
  against all lanes (broadcast again);
* the loop is per-tile early-exiting: a finished tile stops paying for the
  worst ray elsewhere in the batch.

Identical results to ops/bvh.py:traverse (both visit a superset of the
per-ray threaded traversal and fold strict-< minima), enforced by tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unity_raytracer_tpu.ops.bvh import LEAF_SIZE, MeshBVH

EPS = 1e-5
_INF = float("inf")
_BIG = 3.0e38  # finite stand-in for +inf inside the kernel (inf*0 traps)

TILE_R = 1024


def _packet_kernel(leaf_size: int,
                   nmin_ref, nmax_ref, meta_ref, tri_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tmax_ref, t_out_ref, i_out_ref):
    """One ray tile vs the whole (VMEM-resident) threaded BVH.

    meta_ref: [Nn, 4] int32 rows (first, count, miss_next, pad).
    tri_ref:  [T, 9] leaf-ordered triangle rows.
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    tiny = 1e-30
    idx_ = lambda v: jnp.where(jnp.abs(v) < tiny,
                               jnp.where(v < 0, -tiny, tiny), v)
    inv_dx = 1.0 / idx_(dx)
    inv_dy = 1.0 / idx_(dy)
    inv_dz = 1.0 / idx_(dz)

    best_t0 = tmax_ref[:]
    best_i0 = jnp.full((TILE_R,), -1, jnp.int32)

    def cond(c):
        cursor, _, _ = c
        return cursor >= 0

    def body(c):
        cursor, best_t, best_i = c
        # scalar node loads, broadcast to lanes
        lx, ly, lz = (nmin_ref[cursor, 0], nmin_ref[cursor, 1],
                      nmin_ref[cursor, 2])
        hx, hy, hz = (nmax_ref[cursor, 0], nmax_ref[cursor, 1],
                      nmax_ref[cursor, 2])
        first = meta_ref[cursor, 0]
        count = meta_ref[cursor, 1]
        miss = meta_ref[cursor, 2]

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
        any_hit = jnp.any(lane_hit)

        is_leaf = count > 0

        def leaf_tests(args):
            best_t, best_i = args
            for k in range(leaf_size):
                pi = first + k
                ok = k < count
                row = tri_ref[pi, :]
                v0x, v0y, v0z = row[0], row[1], row[2]
                e1x = row[3] - v0x
                e1y = row[4] - v0y
                e1z = row[5] - v0z
                e2x = row[6] - v0x
                e2y = row[7] - v0y
                e2z = row[8] - v0z
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
                best_t = jnp.where(upd, t, best_t)
                best_i = jnp.where(upd, pi, best_i)
            return best_t, best_i

        best_t, best_i = jax.lax.cond(
            is_leaf & any_hit, leaf_tests, lambda a: a, (best_t, best_i))

        descend = any_hit & ~is_leaf
        cursor = jnp.where(descend, cursor + 1, miss)
        return cursor, best_t, best_i

    _, best_t, best_i = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_i0))

    t_out_ref[:] = best_t
    i_out_ref[:] = best_i


def traverse_packet(bvh: MeshBVH, o: jnp.ndarray, d: jnp.ndarray,
                    t_max: jnp.ndarray | None = None,
                    interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packet-traversal nearest mesh hit: ``(t [N], original index [N])``.

    Same contract as ops/bvh.py:traverse: +inf / -1 on miss, ``t_max``
    optionally seeds the cull distance. +inf results are encoded as a big
    finite sentinel inside the kernel and mapped back here.
    """
    n = o.shape[0]
    n_pad = (-n) % TILE_R
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), o.dtype)], 0)
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype),
                         (n_pad, 1))], 0)
    total = o.shape[0]
    if t_max is None:
        tmax = jnp.full((total,), _BIG, jnp.float32)
    else:
        tmax = jnp.concatenate(
            [jnp.minimum(jnp.asarray(t_max, jnp.float32), _BIG),
             jnp.zeros((n_pad,), jnp.float32)], 0) if n_pad else \
            jnp.minimum(jnp.asarray(t_max, jnp.float32), _BIG)

    n_nodes = bvh.n_nodes
    meta = jnp.stack([bvh.first, bvh.count, bvh.miss_next,
                      jnp.zeros_like(bvh.first)], axis=1)  # [Nn,4]
    tri_rows = bvh.tri_verts.reshape(-1, 9)
    n_tris = tri_rows.shape[0]

    grid = (total // TILE_R,)
    kernel = functools.partial(_packet_kernel, LEAF_SIZE)

    rep = lambda *shape: pl.BlockSpec(
        shape, (lambda i: tuple(0 for _ in shape)),
        memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((TILE_R,), lambda i: (i,), memory_space=pltpu.VMEM)

    t_out, i_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            rep(n_nodes, 3),      # node_min
            rep(n_nodes, 3),      # node_max
            rep(n_nodes, 4),      # meta
            rep(n_tris, 9),       # tris
            tile, tile, tile, tile, tile, tile,  # ox..dz
            tile,                 # tmax
        ],
        out_specs=(tile, tile),
        out_shape=(
            jax.ShapeDtypeStruct((total,), jnp.float32),
            jax.ShapeDtypeStruct((total,), jnp.int32),
        ),
        interpret=interpret,
    )(bvh.node_min, bvh.node_max, meta, tri_rows,
      o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmax)

    t_out = jax.lax.stop_gradient(t_out[:n])
    i_out = i_out[:n]
    hit = i_out >= 0
    orig = jnp.where(hit, jnp.take(bvh.prim_index,
                                   jnp.clip(i_out, 0, None)), -1)
    # pallas kernels are not differentiated; re-derive the winner's t
    # through the gathered vertices (same pattern as ops/bvh.py:traverse)
    from unity_raytracer_tpu.ops.bvh import _mt_one
    tri = jnp.take(bvh.tri_verts, jnp.clip(i_out, 0, None), axis=0)
    t_diff = _mt_one(o[:n], d[:n], tri[:, 0], tri[:, 1], tri[:, 2])
    t_final = jnp.where(hit,
                        jnp.where(jnp.isfinite(t_diff), t_diff, t_out),
                        jnp.inf)
    return t_final, orig.astype(jnp.int32)
