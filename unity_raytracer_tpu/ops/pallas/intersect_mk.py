"""Pallas megakernel: fused brute-force nearest-hit over ray tiles.

The XLA brute-force path (ops/intersect.py) materializes the full
``[N_rays, N_prims]`` t-matrix in HBM before the argmin reduction — at 1M
rays x 1k prims that's 4 GB of HBM traffic for values that are consumed
once. This kernel keeps a ray tile resident in VMEM, streams primitive
blocks through VMEM, and folds the running (t, index) minimum in-register —
HBM traffic drops to O(rays + prims) instead of O(rays * prims).

Layout notes (see /opt/skills/guides/pallas_guide.md):
* rays are tiled TILE_R at a time (sublane-friendly multiples of 8);
* triangle data is fed as 9 planar arrays [T] (SoA) so each block load is
  a contiguous (BLOCK_T,)-vector — no (T,3,3) gather patterns;
* the inner loop is a static Python unroll over primitive blocks (grid
  dimension), everything branchless/masked exactly like the jnp kernels
  (same epsilons as RMath.cs:9 so results match bit-for-bit-ish).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
_INF = float("inf")  # python literal: a jnp scalar here would be captured
#                      as a traced constant inside the kernel (disallowed)

TILE_R = 512     # rays per grid step
BLOCK_T = 512    # triangles per inner block


def _tri_soa(verts: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """[T,3,3] -> 9 planar [T] arrays (v0x..v2z)."""
    v = verts.reshape(verts.shape[0], 9)
    return tuple(v[:, i] for i in range(9))


def _nearest_tri_kernel(n_blocks: int,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tri_ref, valid_ref,
                        t_out_ref, i_out_ref):
    """One ray tile vs all triangle blocks.

    tri_ref: [T, 9] triangle soup rows (v0,v1,v2 xyz); valid_ref: [T] f32
    (1 = live). Outputs per-ray (min t, argmin index) with first-min
    tie-break (strict < update, ascending block order).
    """
    ox = ox_ref[:]          # [TILE_R]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]

    best_t = jnp.full((TILE_R,), _INF, jnp.float32)
    best_i = jnp.full((TILE_R,), -1, jnp.int32)

    for b in range(n_blocks):
        tri = tri_ref[pl.ds(b * BLOCK_T, BLOCK_T), :]      # [BLOCK_T, 9]
        live = valid_ref[pl.ds(b * BLOCK_T, BLOCK_T)]      # [BLOCK_T]
        v0x, v0y, v0z = tri[:, 0], tri[:, 1], tri[:, 2]
        v1x, v1y, v1z = tri[:, 3], tri[:, 4], tri[:, 5]
        v2x, v2y, v2z = tri[:, 6], tri[:, 7], tri[:, 8]

        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z

        # h = d x e2  -> [TILE_R, BLOCK_T] per component
        hx = dy[:, None] * e2z[None, :] - dz[:, None] * e2y[None, :]
        hy = dz[:, None] * e2x[None, :] - dx[:, None] * e2z[None, :]
        hz = dx[:, None] * e2y[None, :] - dy[:, None] * e2x[None, :]
        a = e1x[None, :] * hx + e1y[None, :] * hy + e1z[None, :] * hz
        parallel = jnp.abs(a) < EPS
        f = 1.0 / jnp.where(parallel, 1.0, a)

        sx = ox[:, None] - v0x[None, :]
        sy = oy[:, None] - v0y[None, :]
        sz = oz[:, None] - v0z[None, :]
        u = f * (sx * hx + sy * hy + sz * hz)

        qx = sy * e1z[None, :] - sz * e1y[None, :]
        qy = sz * e1x[None, :] - sx * e1z[None, :]
        qz = sx * e1y[None, :] - sy * e1x[None, :]
        v = f * (dx[:, None] * qx + dy[:, None] * qy + dz[:, None] * qz)
        t = f * (e2x[None, :] * qx + e2y[None, :] * qy + e2z[None, :] * qz)

        miss = (parallel | (u < 0.0) | (u > 1.0) | (v < 0.0)
                | (u + v > 1.0) | (t <= EPS) | (live[None, :] < 0.5))
        t = jnp.where(miss, _INF, t)

        # fold block minimum into the running best (first-min tie-break)
        blk_i = jnp.argmin(t, axis=1).astype(jnp.int32)
        blk_t = jnp.min(t, axis=1)
        upd = blk_t < best_t
        best_t = jnp.where(upd, blk_t, best_t)
        best_i = jnp.where(upd, blk_i + b * BLOCK_T, best_i)

    t_out_ref[:] = best_t
    i_out_ref[:] = best_i


def nearest_triangle_pallas(o: jnp.ndarray, d: jnp.ndarray,
                            verts: jnp.ndarray,
                            valid: jnp.ndarray | None = None,
                            interpret: bool = False
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-triangle query ``(t [N], index [N])``, +inf / -1 on miss.

    Drop-in accelerator for the brute-force mesh/loose-triangle paths.
    Pads rays to TILE_R and triangles to BLOCK_T multiples internally.
    """
    n = o.shape[0]
    t_count = verts.shape[0]
    if valid is None:
        valid = jnp.ones((t_count,), bool)

    n_pad = (-n) % TILE_R
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), o.dtype)], 0)
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype),
                         (n_pad, 1))], 0)
    t_pad = (-t_count) % BLOCK_T
    if t_pad:
        verts = jnp.concatenate(
            [verts, jnp.zeros((t_pad, 3, 3), verts.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((t_pad,), bool)], 0)

    total_r = o.shape[0]
    total_t = verts.shape[0]
    n_blocks = total_t // BLOCK_T

    tri_rows = verts.reshape(total_t, 9)
    valid_f = valid.astype(jnp.float32)

    grid = (total_r // TILE_R,)
    kernel = functools.partial(_nearest_tri_kernel, n_blocks)

    t_out, i_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),  # ox
            pl.BlockSpec((TILE_R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),  # oy
            pl.BlockSpec((TILE_R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),  # oz
            pl.BlockSpec((TILE_R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),  # dx
            pl.BlockSpec((TILE_R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),  # dy
            pl.BlockSpec((TILE_R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),  # dz
            pl.BlockSpec((total_t, 9), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # tris (replicated)
            pl.BlockSpec((total_t,), lambda i: (0,),
                         memory_space=pltpu.VMEM),  # valid
        ],
        out_specs=(
            pl.BlockSpec((TILE_R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((total_r,), jnp.float32),
            jax.ShapeDtypeStruct((total_r,), jnp.int32),
        ),
        interpret=interpret,
    )(*[jax.lax.stop_gradient(x) for x in
        (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         tri_rows, valid_f)])
    # gradients are cut at the kernel (no pallas JVP rule); callers that
    # need a differentiable t re-derive it from the winning index
    # (ops/intersect.nearest_hit does)
    return t_out[:n], i_out[:n]
