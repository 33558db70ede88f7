"""Packet traversal, lane-major layout — fits 100k-triangle BVHs in VMEM.

VMEM arrays pad their minormost dim to 128 lanes, so the row-major layout
of traverse_mk ((T,9) triangles, (Nn,3) nodes) physically costs
``rows x 128 x 4B``: 52 MB for 100k triangles — over VMEM. This variant
transposes everything so the LARGE dimension sits in lanes:

* ``tris  (16, Tp)``  — 9 vertex components (sublane-padded), T in lanes
* ``nodes (8, Np)``   — rows 0-2 node_min, 3-5 node_max, T in lanes
* ``meta  (8, Np)``   — int32 rows: first, count, miss_next

100k tris + 64k nodes ≈ 6.5 + 2 + 2 MB — comfortably resident. Node/
triangle reads are scalar loads at dynamic lane offsets, broadcast to the
ray tile exactly as in traverse_mk.
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
_BIG = 3.0e38

TILE_R = 1024


def _kernel(leaf_size: int,
            nodes_ref, meta_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmax_ref, t_out_ref, i_out_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    tiny = 1e-30
    fix = lambda v: jnp.where(jnp.abs(v) < tiny,
                              jnp.where(v < 0, -tiny, tiny), v)
    inv_dx = 1.0 / fix(dx)
    inv_dy = 1.0 / fix(dy)
    inv_dz = 1.0 / fix(dz)

    def cond(c):
        cursor, _, _ = c
        return cursor >= 0

    def body(c):
        cursor, best_t, best_i = c
        lx = nodes_ref[0, cursor]
        ly = nodes_ref[1, cursor]
        lz = nodes_ref[2, cursor]
        hx = nodes_ref[3, cursor]
        hy = nodes_ref[4, cursor]
        hz = nodes_ref[5, cursor]
        first = meta_ref[0, cursor]
        count = meta_ref[1, cursor]
        miss = meta_ref[2, cursor]

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
                v0x = tris_ref[0, pi]
                v0y = tris_ref[1, pi]
                v0z = tris_ref[2, pi]
                e1x = tris_ref[3, pi] - v0x
                e1y = tris_ref[4, pi] - v0y
                e1z = tris_ref[5, pi] - v0z
                e2x = tris_ref[6, pi] - v0x
                e2y = tris_ref[7, pi] - v0y
                e2z = tris_ref[8, pi] - v0z
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

    best_t0 = tmax_ref[:]
    best_i0 = jnp.full((TILE_R,), -1, jnp.int32)
    _, best_t, best_i = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_i0))

    t_out_ref[:] = best_t
    i_out_ref[:] = best_i


def pack_lane_major(bvh: MeshBVH) -> Tuple[jnp.ndarray, jnp.ndarray,
                                           jnp.ndarray]:
    """Transpose BVH arrays into the lane-major VMEM layout.

    Returns (nodes [8,Np] f32, meta [8,Np] i32, tris [16,Tp] f32) with
    lanes padded to multiples of 128.
    """
    nn = bvh.n_nodes
    nt = bvh.tri_verts.shape[0]
    npad = (-nn) % 128
    tpad = (-nt) % 128

    nodes = jnp.concatenate([bvh.node_min.T, bvh.node_max.T,
                             jnp.zeros((2, nn), jnp.float32)], axis=0)
    if npad:
        nodes = jnp.pad(nodes, ((0, 0), (0, npad)))
    meta = jnp.stack([bvh.first, bvh.count, bvh.miss_next], axis=0)
    meta = jnp.concatenate([meta, jnp.zeros((5, nn), jnp.int32)], axis=0)
    if npad:
        # padded nodes: count=0, miss=-1 => instantly terminate if reached
        meta = jnp.pad(meta, ((0, 0), (0, npad)),
                       constant_values=-1)
    tris = bvh.tri_verts.reshape(nt, 9).T  # [9, T]
    tris = jnp.concatenate([tris, jnp.zeros((7, nt), jnp.float32)], axis=0)
    if tpad:
        tris = jnp.pad(tris, ((0, 0), (0, tpad)))
    return nodes, meta, tris


def traverse_packet2(bvh: MeshBVH, o: jnp.ndarray, d: jnp.ndarray,
                     t_max: jnp.ndarray | None = None,
                     interpret: bool = False,
                     packed=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-major packet traversal; same contract as traverse_packet.

    ``packed`` may pass a cached ``pack_lane_major(bvh)`` result to avoid
    re-packing per call.
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
        tm = jnp.minimum(jnp.asarray(t_max, jnp.float32), _BIG)
        tmax = (jnp.concatenate([tm, jnp.zeros((n_pad,), jnp.float32)], 0)
                if n_pad else tm)

    nodes, meta, tris = packed if packed is not None else pack_lane_major(bvh)

    grid = (total // TILE_R,)
    kernel = functools.partial(_kernel, LEAF_SIZE)

    rep = lambda *shape: pl.BlockSpec(
        shape, (lambda i: tuple(0 for _ in shape)),
        memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((TILE_R,), lambda i: (i,), memory_space=pltpu.VMEM)

    t_out, i_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[rep(*nodes.shape), rep(*meta.shape), rep(*tris.shape),
                  tile, tile, tile, tile, tile, tile, tile],
        out_specs=(tile, tile),
        out_shape=(
            jax.ShapeDtypeStruct((total,), jnp.float32),
            jax.ShapeDtypeStruct((total,), jnp.int32),
        ),
        interpret=interpret,
    )(nodes, meta, tris,
      o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmax)

    t_out = jax.lax.stop_gradient(t_out[:n])
    i_out = i_out[:n]
    hit = i_out >= 0
    orig = jnp.where(hit, jnp.take(bvh.prim_index,
                                   jnp.clip(i_out, 0, None)), -1)
    from unity_raytracer_tpu.ops.bvh import _mt_one
    tri = jnp.take(bvh.tri_verts, jnp.clip(i_out, 0, None), axis=0)
    t_diff = _mt_one(o[:n], d[:n], tri[:, 0], tri[:, 1], tri[:, 2])
    t_final = jnp.where(hit,
                        jnp.where(jnp.isfinite(t_diff), t_diff, t_out),
                        jnp.inf)
    return t_final, orig.astype(jnp.int32)
