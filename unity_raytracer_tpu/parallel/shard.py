"""Sharded rendering + distributed training step (shard_map / GSPMD).

Three scaling regimes, mirroring SP/TP/ring-attention (SURVEY.md §5.7):

1. ``render_tiled`` — rays sharded over ``dp``, scene replicated. Zero
   communication in forward except the final gather. The default and the
   BASELINE config-5 shape.
2. ``scene_sharded_hit`` — mesh triangles sharded over ``tp``, rays
   replicated; per-device partial nearest hit combined with a lexicographic
   (t, id) pmin (collectives.min_hit_combine). For scenes too big to
   replicate.
3. ``nearest_hit_ring`` — rays AND scene sharded on one axis; scene shards
   rotate around the ring with ``lax.ppermute`` while each ray shard folds
   a running nearest hit — the ray-tracing analogue of ring attention's KV
   rotation with min-combine instead of softmax accumulation.

``make_sharded_train_step`` runs inverse rendering with the loss psum'd over
``dp``; the backward pass then carries the scene-parameter gradient
all-reduce, which XLA's scheduler overlaps with backward compute.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from unity_raytracer_tpu.models.camera import Camera, generate_rays
from unity_raytracer_tpu.models.scene import Scene
from unity_raytracer_tpu.ops import intersect as isect
from unity_raytracer_tpu.ops.intersect import Hit, KIND_NONE
from unity_raytracer_tpu.ops.render import trace_radiance, resolve_mode
from unity_raytracer_tpu.parallel import collectives
from unity_raytracer_tpu.parallel.mesh import RAY_AXIS, SCENE_AXIS
from unity_raytracer_tpu.utils.config import RenderConfig


def _pad_rays(o, d, multiple: int):
    n = o.shape[0]
    pad = (-n) % multiple
    if pad:
        filler_d = jnp.zeros((pad, 3), d.dtype).at[:, 2].set(1.0)
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
        d = jnp.concatenate([d, filler_d], axis=0)
    return o, d, n


def render_tiled(scene: Scene, cam: Camera, cfg: RenderConfig, mesh: Mesh,
                 bvh=None) -> jnp.ndarray:
    """Regime 1: explicit shard_map render, rays over ``dp``.

    Returns the [H,W,3] display-scale image. Scene (and BVH) are replicated
    broadcast operands.
    """
    cfg = resolve_mode(scene, cfg)
    o, d = generate_rays(cam)
    n_dp = mesh.shape[RAY_AXIS]
    o, d, n = _pad_rays(o, d, n_dp)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(RAY_AXIS), P(RAY_AXIS)),
             out_specs=P(RAY_AXIS), check_vma=False)
    def _go(scene_, bvh_, o_, d_):
        return trace_radiance(scene_, o_, d_, cfg, bvh=bvh_)

    rad = _go(scene, bvh, o, d)[:n]
    return rad.reshape(cam.height, cam.width, 3) / 255.0


def render_auto(scene: Scene, cam: Camera, cfg: RenderConfig, mesh: Mesh,
                bvh=None) -> jnp.ndarray:
    """Regime 1 via GSPMD: annotate ray shardings, let XLA partition.

    The idiomatic pjit path — same math, compiler-chosen comms.
    """
    cfg = resolve_mode(scene, cfg)
    o, d = generate_rays(cam)
    n_dp = mesh.shape[RAY_AXIS]
    o, d, n = _pad_rays(o, d, n_dp)
    ray_sh = NamedSharding(mesh, P(RAY_AXIS))
    o = jax.device_put(o, ray_sh)
    d = jax.device_put(d, ray_sh)
    rad = trace_radiance(scene, o, d, cfg, bvh=bvh)[:n]
    return rad.reshape(cam.height, cam.width, 3) / 255.0


# ---------------------------------------------------------------------------
# Regime 2: scene sharded (TP analogue)
# ---------------------------------------------------------------------------

def shard_scene_mesh_tris(scene: Scene, mesh: Mesh) -> Scene:
    """Place the mesh-triangle arrays sharded over ``tp`` (row-sharded);
    everything else replicated. Requires M % tp == 0 (pad the builder)."""
    tp_sh = NamedSharding(mesh, P(SCENE_AXIS))
    rep = NamedSharding(mesh, P())
    m = scene.meshes
    m = dataclasses.replace(
        m,
        verts=jax.device_put(m.verts, tp_sh),
        normals=jax.device_put(m.normals, tp_sh),
        mesh_id=jax.device_put(m.mesh_id, tp_sh),
        valid=jax.device_put(m.valid, tp_sh))
    return dataclasses.replace(jax.device_put(scene, rep), meshes=m)


def scene_sharded_hit(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                      mesh: Mesh) -> Hit:
    """Nearest hit with mesh triangles sharded over ``tp``.

    Each device brute-forces its triangle shard (plus the replicated sphere/
    loose-triangle tables), then partial winners combine with the
    lexicographic (t, key) pmin. Exactly equal to the single-device result,
    including the reference's category tie order (keys pack kind-major).
    """
    tp = mesh.shape[SCENE_AXIS]
    m_total = scene.meshes.count
    assert m_total % tp == 0, "pad mesh triangles to a multiple of tp"
    shard_rows = m_total // tp

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(SCENE_AXIS), P(SCENE_AXIS), P(SCENE_AXIS),
                       P(SCENE_AXIS), P(), P()),
             out_specs=(P(), P(), P(), P()), check_vma=False)
    def _go(scene_, mverts, mnormals, mid, mvalid, o_, d_):
        local = dataclasses.replace(
            scene_, meshes=dataclasses.replace(
                scene_.meshes, verts=mverts, normals=mnormals,
                mesh_id=mid, valid=mvalid))
        hit = isect.nearest_hit(local, o_, d_)
        # globalize mesh-triangle indices
        shard_i = jax.lax.axis_index(SCENE_AXIS)
        gl_index = jnp.where(hit.kind == isect.KIND_MESH,
                             hit.index + shard_i * shard_rows, hit.index)
        key = collectives.pack_hit(hit.kind, jnp.clip(gl_index, 0, None))
        key = jnp.where(hit.kind == KIND_NONE, jnp.int32(2**31 - 1), key)
        t_g, key_g = collectives.min_hit_combine(hit.t, key, SCENE_AXIS)
        kind_g, index_g = collectives.unpack_hit(key_g)
        missed = key_g == 2**31 - 1
        kind_g = jnp.where(missed, KIND_NONE, kind_g)
        index_g = jnp.where(missed, -1, index_g)
        mesh_index = jnp.where(
            kind_g == isect.KIND_MESH,
            jnp.take(scene.meshes.mesh_id, jnp.clip(index_g, 0, None)),
            jnp.int32(-1))
        return t_g, kind_g, index_g, mesh_index

    # NOTE: mesh_id gather above uses the full (replicated) table captured
    # from the outer scene for the final mapping.
    t, kind, index, mesh_index = _go(
        scene, scene.meshes.verts, scene.meshes.normals, scene.meshes.mesh_id,
        scene.meshes.valid, o, d)
    return Hit(t=t, kind=kind, index=index, mesh_index=mesh_index)


# ---------------------------------------------------------------------------
# Regime 3: ring pass (rays and scene both sharded on one axis)
# ---------------------------------------------------------------------------

def nearest_mesh_hit_ring(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                          mesh: Mesh, axis: str = RAY_AXIS
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ring traversal of the mesh-triangle soup: ray shards stay resident,
    triangle shards rotate with ppermute; each step folds the running best
    (t, global index). Returns (t [N], global mesh-tri index [N] or -1).

    Communication pattern == ring attention's KV rotation; combine is min
    instead of softmax-accumulate (SURVEY.md §5.7 regime 3).
    """
    size = mesh.shape[axis]
    m_total = scene.meshes.count
    assert m_total % size == 0
    rows = m_total // size

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis)),
             out_specs=(P(axis), P(axis)), check_vma=False)
    def _go(mverts, mvalid, o_, d_):
        my = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % size) for i in range(size)]

        def step(carry, _):
            verts, valid, shard_id, best_t, best_i = carry
            t = isect.ray_triangles(o_, d_, verts, valid)
            i_loc = jnp.argmin(t, axis=1).astype(jnp.int32)
            t_loc = jnp.take_along_axis(t, i_loc[:, None], axis=1)[:, 0]
            gl = i_loc + shard_id * rows
            upd = t_loc < best_t
            best_t = jnp.where(upd, t_loc, best_t)
            best_i = jnp.where(upd, gl, best_i)
            # rotate the triangle shard (and its identity) around the ring
            verts = jax.lax.ppermute(verts, axis, perm)
            valid = jax.lax.ppermute(valid, axis, perm)
            shard_id = jax.lax.ppermute(shard_id, axis, perm)
            return (verts, valid, shard_id, best_t, best_i), None

        n_loc = o_.shape[0]
        init = (mverts, mvalid, my,
                jnp.full((n_loc,), jnp.inf, jnp.float32),
                jnp.full((n_loc,), -1, jnp.int32))
        (_, _, _, best_t, best_i), _ = jax.lax.scan(
            step, init, None, length=size)
        return best_t, best_i

    return _go(scene.meshes.verts, scene.meshes.valid, o, d)


def make_sharded_train_step(template: Scene, cam: Camera, rcfg: RenderConfig,
                            target: jnp.ndarray, mesh: Mesh,
                            param_names: Tuple[str, ...], tx) -> Callable:
    """Distributed inverse-rendering step: rays sharded over dp, loss psum,
    scene-parameter grad all-reduce carried by shard_map's backward (XLA
    overlaps it with backward compute).

    Returns jitted ``step(params, opt_state, o, d, tgt) ->
    (params, opt_state, loss)`` where o/d/tgt are pre-sharded flat rays.
    """
    from unity_raytracer_tpu.fit import set_params

    rcfg = resolve_mode(template, rcfg)
    n_total = cam.width * cam.height

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
             out_specs=P(), check_vma=False)
    def sharded_loss(params, o_, d_, tgt_):
        scene = set_params(template, params)
        rad = trace_radiance(scene, o_, d_, rcfg) / 255.0
        sse = jnp.sum((rad - tgt_) ** 2)
        return jax.lax.psum(sse, RAY_AXIS) / (n_total * 3)

    @jax.jit
    def step(params, opt_state, o, d, tgt):
        loss, grads = jax.value_and_grad(
            lambda p: sharded_loss(p, o, d, tgt))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
