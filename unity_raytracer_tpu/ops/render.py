"""Wavefront renderer: raygen -> bounce chain -> image.

The reference's per-pixel recursion (Demo-RayTracing/RayTracingSetup.cs:
288-301 pixel loop, :304-366 recursive ``Shade``) is re-designed as a batched
bounce chain over flat ray tensors:

* **linear chain** (`_trace_chain`) — the exact reference semantics: only
  mirrors spawn secondary rays, so the ray tree is a path; carried state is
  ``(origin, dir, throughput, active, accum)`` and depth is a static unrolled
  loop (max_bounces is tiny and static, which XLA fuses best).
* **branching tree** (`_trace_tree`) — the refraction extension (baseline
  config 2): dielectric hits spawn reflect+refract children; recursion is
  static Python recursion to a fixed depth, each node fully batched.

Radiance accumulates on the reference's 0-255 Rgb scale; `render` divides by
255 at the end like ``Rgb.Color`` (Data/Shading/Rgb.cs:13).

All ``where`` selects use guarded operands (no inf/NaN on masked lanes) so
the whole pipeline is cleanly differentiable — masked-out lanes cannot
poison gradients.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unity_raytracer_tpu.models.camera import (
    Camera, generate_rays, generate_rays_blocks)
from unity_raytracer_tpu.models.scene import Scene
from unity_raytracer_tpu.ops import shade as sh
from unity_raytracer_tpu.ops.intersect import Hit, nearest_hit
from unity_raytracer_tpu.utils.config import RenderConfig

SHADOW_EPS = sh.SHADOW_EPS


def _local_radiance(scene: Scene, o, d, cfg: RenderConfig,
                    hit: Hit, bvh=None,
                    active: jnp.ndarray | None = None,
                    with_stats: bool = False):
    """Shared per-segment work: surface point, attributes, local shading.

    Returns (contrib [N,3] — local radiance or background, p, n, mats,
    hit_mask); with ``with_stats`` the tuple is paired with the number of
    live shadow-query lanes this segment issued. Masked lanes carry safe
    (finite) values.
    """
    hit_mask = hit.is_hit
    soft_temp = cfg.diff.soft_hit_temp
    if soft_temp > 0.0:
        # SoftRas-style silhouette relaxation for spheres: miss rays adopt a
        # proxy hit on their best near-miss sphere (shaded at the closest-
        # approach point) so the soft blend weight has a sensible color to
        # blend toward; forward values stay exactly hard via straight-through.
        # Computed as a running argmax over the (small, unrolled) sphere
        # table in [N]-shaped temps — the take_along_axis form this
        # replaces lowered to per-lane gathers costing ~16ms per call at
        # 524k lanes on v5e (cornell/soft-replay xprof traces, r4).
        from unity_raytracer_tpu.ops.intersect import KIND_SPHERE
        S = scene.spheres.count
        margs = []
        m_best = jnp.full(hit_mask.shape, -jnp.inf)
        j_best = jnp.zeros(hit_mask.shape, jnp.int32)
        t_close_best = jnp.full(hit_mask.shape, 1e-3)
        for si in range(S):
            oc = o - scene.spheres.centers[si][None, :]
            uoc = jnp.sum(d * oc, axis=-1)
            oc2 = jnp.sum(oc * oc, axis=-1)
            r2s = scene.spheres.radius_sq[si]
            disc = uoc * uoc - (oc2 - r2s)
            marg = disc / jnp.maximum(r2s, 1e-12)
            okm = ((-uoc) > 0.0) & scene.spheres.valid[si]
            marg = jnp.where(okm, marg, -jnp.inf)
            margs.append(marg)
            better = marg > m_best   # first max wins ties (== argmax)
            m_best = jnp.where(better, marg, m_best)
            j_best = jnp.where(better, si, j_best)
            t_close_best = jnp.where(better, jnp.maximum(-uoc, 1e-3),
                                     t_close_best)
        proxy_ok = jnp.isfinite(m_best)
        use_proxy = ~hit_mask & proxy_ok
        hit = Hit(
            t=jnp.where(use_proxy, t_close_best, hit.t),
            kind=jnp.where(use_proxy, KIND_SPHERE, hit.kind),
            index=jnp.where(use_proxy, j_best, hit.index),
            mesh_index=hit.mesh_index, mesh_n=hit.mesh_n)
        shade_mask = hit_mask | use_proxy
        # winner margin: sphere hits use their own margin (relaxes the
        # sphere's own silhouette); non-sphere hits stay hard (+inf)
        win_sphere = hit_mask & (hit.kind == KIND_SPHERE)
        sel_idx = jnp.where(win_sphere,
                            jnp.clip(hit.index, 0, max(S - 1, 0)),
                            j_best)
        own = margs[0] if S else jnp.full(hit_mask.shape, -jnp.inf)
        for si in range(1, S):
            own = jnp.where(sel_idx == si, margs[si], own)
        margin_sel = jnp.where(win_sphere | use_proxy, own, jnp.inf)
        w_soft = jax.nn.sigmoid(
            jnp.clip(margin_sel / soft_temp, -30.0, 30.0))
        if cfg.diff.straight_through:  # forward hard, backward soft
            w = w_soft + jax.lax.stop_gradient(
                hit_mask.astype(jnp.float32) - w_soft)
        else:
            w = w_soft
    else:
        shade_mask = hit_mask
        w = hit_mask.astype(jnp.float32)

    t_safe = jnp.where(shade_mask, hit.t, 1.0)
    p = o + d * t_safe[:, None]
    n, mats = sh.surface_attributes(scene, p, hit)
    v = -d  # unit direction back toward the segment origin (= reference's
    #         normalize(rayOrigin - surfacePoint), RayTracingSetup.cs:325)
    shadow_mask = shade_mask if active is None else (shade_mask & active)
    local, n_shadow = sh.direct_lighting(
        scene, p, n, v, mats,
        soft_shadow_temp=cfg.diff.soft_shadow_temp,
        straight_through=cfg.diff.straight_through, bvh=bvh,
        kernel=cfg.kernel, mask=shadow_mask,
        light_cull=cfg.light_cull, with_stats=True)
    bg = jnp.asarray(cfg.background, jnp.float32) * 255.0
    local_safe = jnp.where(shade_mask[:, None], local, bg[None, :])
    contrib = bg[None, :] + w[:, None] * (local_safe - bg[None, :])
    out = (contrib, p, n, mats, hit_mask)
    return (out, n_shadow) if with_stats else out


def _trace_chain_mega(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                      cfg: RenderConfig, bvh) -> jnp.ndarray:
    """Bounce chain on the fused segment megakernel (ops/pallas/mega.py):
    nearest hit + shadows + shading + mirror continuation in ONE Pallas
    launch per segment, with all-dead tiles exiting at a single predicate.
    Hard forward path only (temps 0); parity vs the composed path is
    asserted in tests/test_mega.py."""
    import jax as _jax

    from unity_raytracer_tpu.ops.pallas.mega import (
        build_aux, trace_segment)

    n_rays = o.shape[0]
    aux = build_aux(scene, cfg.background)
    kw = dict(n_lights=scene.lights.positions.shape[0],
              n_spheres=scene.spheres.count,
              n_tris=scene.triangles.count,
              max_bounces=cfg.max_bounces,
              interpret=_jax.default_backend() == "cpu",
              tile_r=cfg.tile_r,
              use_wide=cfg.bvh_arity != 0,
              fuse_shadows=cfg.fuse_shadows,
              walk_unroll=cfg.walk_unroll,
              occ_mode=cfg.occ_mode,
              light_cull=cfg.light_cull,
              tri_isect=cfg.tri_isect,
              shadow_batch=cfg.shadow_batch,
              stale_prune=cfg.stale_prune,
              near_mode=cfg.near_mode,
              dbg=cfg.dbg)

    acc0 = jnp.zeros((n_rays, 3), jnp.float32)
    thr0 = jnp.ones((n_rays, 3), jnp.float32)
    tmax0 = jnp.full((n_rays,), 3.0e38, jnp.float32)

    def bounce(carry, depth):
        o, d, thr, tmax, acc = carry

        def live_seg(args):
            o, d, thr, tmax, acc = args
            delta, o2, d2, thr2, tm2 = trace_segment(
                bvh, aux, depth, o, d, thr, tmax, **kw)
            return o2, d2, thr2, tm2, acc + delta

        carry = jax.lax.cond(jnp.any(tmax >= 0.0), live_seg,
                             lambda a: a, (o, d, thr, tmax, acc))
        return carry, None

    (_, _, _, _, acc), _ = jax.lax.scan(
        bounce, (o, d, thr0, tmax0, acc0),
        jnp.arange(cfg.max_bounces + 1), unroll=1)
    return acc


def _trace_chain(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                 cfg: RenderConfig, bvh=None,
                 with_stats: bool = False) -> jnp.ndarray:
    """Mirror-only linear bounce chain — exact reference semantics.

    Segment s contributes ``prod(mirror_0..s-1) * local_s``; the chain stops
    at the first non-mirror hit or miss, and the bounce cap means segment
    depth max_bounces shades locally but spawns nothing
    (``IsMirror && bounce < MaxReflectionBounces``, RayTracingSetup.cs:358).

    Dead-lane handling (measured on v5e, scripts/glue_study.py):

    * retired lanes are culled from the packet-traversal union via
      ``t_max = -1``; with block-ordered lanes (generate_rays_blocks) the
      surviving bounce rays stay spatially clustered, so most tiles turn
      all-dead and exit the kernels at the root test;
    * a whole segment with ZERO live lanes is skipped entirely with one
      ``lax.cond`` (the flagship scene is dead after segment 1 — live
      counts [2.07M, 126k, 0, 0, 0]);
    * live-first lane COMPACTION between bounces was tried and REVERTED:
      the permutation costs ~5 [N]-gathers + a scatter per segment
      (~0.5-1.5s/frame at 2M lanes — gathers/scatters are ~0.15-0.3s each
      on v5e) to save ~10ms of traversal. Negative result, kept out.

    ``with_stats`` additionally returns ``(live [B], shadow_live [B])`` lane
    counts per segment — the honest-ray-accounting inputs for bench.py.
    """
    if (cfg.kernel == "mega" and not with_stats and bvh is not None
            and getattr(bvh, "leafmeta", None) is not None
            and cfg.diff.soft_hit_temp == 0.0
            and cfg.diff.soft_shadow_temp == 0.0):
        return _trace_chain_mega(scene, o, d, cfg, bvh)

    n_rays = o.shape[0]
    acc0 = jnp.zeros((n_rays, 3), jnp.float32)
    thr0 = jnp.ones((n_rays, 3), jnp.float32)
    active0 = jnp.ones((n_rays,), bool)

    def live_seg(args):
        o, d, thr, active, acc, depth = args
        # retired lanes are culled from the traversal union via t_max=-1
        tmax = jnp.where(active, 3.0e38, -1.0)
        with jax.named_scope("nearest_hit"):
            hit = nearest_hit(scene, o, d, bvh=bvh, kernel=cfg.kernel,
                              t_max=tmax)
        with jax.named_scope("shade"):
            (contrib, p, n, mats, hit_mask), n_shadow = _local_radiance(
                scene, o, d, cfg, hit, bvh=bvh, active=active,
                with_stats=True)
        acc = acc + thr * contrib * active[:, None]
        with jax.named_scope("bounce_update"):
            cont = (active & hit_mask & mats.is_mirror
                    & (depth < cfg.max_bounces))
            thr = jnp.where(cont[:, None], thr * mats.mirror, thr)
            o = p + n * SHADOW_EPS    # Reflect origin offset (:368-373)
            d = jnp.where(cont[:, None], sh.reflect_dir(d, n), d)
        return (o, d, thr, cont, acc), n_shadow

    def dead_seg(args):
        o, d, thr, active, acc, depth = args
        return (o, d, thr, active, acc), jnp.int32(0)

    def bounce(carry, depth):
        o, d, thr, active, acc = carry
        n_live = jnp.sum(active.astype(jnp.int32))
        carry, n_shadow = jax.lax.cond(
            n_live > 0, live_seg, dead_seg, (o, d, thr, active, acc, depth))
        return carry, (n_live, n_shadow)

    # lax.scan: the bounce body compiles ONCE regardless of depth — keeps
    # XLA program size (and remote-compile time) flat vs depth, unlike a
    # Python unroll which inlines the intersect+shade stage per segment.
    # cfg.remat checkpoints the body so the backward pass recomputes each
    # segment from its [N]-sized carry instead of storing the full
    # intersect+shade residuals (20+ [N,*] temps/segment at 1080p).
    bounce_fn = jax.checkpoint(bounce) if cfg.remat else bounce
    (_, _, _, _, acc), stats = jax.lax.scan(
        bounce_fn, (o, d, thr0, active0, acc0),
        jnp.arange(cfg.max_bounces + 1), unroll=1)
    if with_stats:
        return acc, stats
    return acc


def _trace_tree(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                cfg: RenderConfig, depth: int, bvh=None,
                with_stats: bool = False) -> jnp.ndarray:
    """Whitted tree with mirror + dielectric branches, evaluated as a
    LEVEL-SYNCHRONOUS WAVEFRONT.

    A naive recursive tree would inline 2^depth intersect+shade stages and
    blow up XLA compile time exponentially. Instead each depth level is ONE
    batched stage over a widened lane array: every dielectric hit forks its
    lane into (reflect, refract) children, and a segment scatter-add folds
    each lane's weighted radiance back into its primary ray. Lane arrays
    are kept at O(cfg.tree_cap * n_rays) by dead-fork compaction — the
    exactly-dead children (zero reflect weight, TIR refract, misses) that
    would otherwise make lane count 2^depth are sorted out after each
    fork. Mirror-only scenes should use the linear chain instead
    (mode='scan').

    The reflect child is shared between mirrors (weight
    ``is_mirror*MirrorReflectance``, reference RayTracingSetup.cs:358-363)
    and dielectrics (weight ``is_dielectric*F*transparency``, Schlick
    Fresnel — the refraction extension the reference lacks).
    """
    del depth  # the wavefront always starts at the root
    n_rays = o.shape[0]
    branching = scene_has_dielectrics_static(scene)

    acc = jnp.zeros((n_rays, 3), jnp.float32)
    parent = jnp.arange(n_rays, dtype=jnp.int32)   # lane -> primary ray
    weight = jnp.ones((n_rays, 3), jnp.float32)    # accumulated throughput
    live = jnp.ones((n_rays,), bool)
    # live weighted lanes dropped by tree_cap compaction (accuracy loss
    # when > 0) — returned as a plain array so TPU runs can detect cap
    # overflow without a host callback (advisor r4; the jax.debug.print
    # below only exists on the CPU backend)
    n_truncated = jnp.int32(0)

    for level in range(cfg.max_bounces + 1):
        tmax = jnp.where(live, 3.0e38, -1.0)
        hit = nearest_hit(scene, o, d, bvh=bvh, kernel=cfg.kernel,
                          t_max=tmax)
        contrib, p, n, mats, hit_mask = _local_radiance(
            scene, o, d, cfg, hit, bvh=bvh, active=live)
        lane_rad = weight * contrib * live[:, None]
        acc = acc.at[parent].add(lane_rad)
        if level == cfg.max_bounces:
            break

        hm = hit_mask[:, None]
        d_dot_n = jnp.sum(d * n, axis=-1, keepdims=True)
        entering = (d_dot_n < 0.0)
        n_eff = jnp.where(entering, n, -n)
        is_die = mats.is_dielectric[:, None]
        is_mir = mats.is_mirror[:, None]

        n_refl = jnp.where(is_die, n_eff, n)
        ro = p + n_refl * SHADOW_EPS   # Reflect origin offset (:368-373)
        rd = sh.reflect_dir(d, n_refl)
        rd_safe = jnp.where(hm, rd, jnp.asarray([0.0, 0.0, 1.0]))

        ior = mats.ior
        n1 = jnp.where(entering[:, 0], 1.0, ior)
        n2 = jnp.where(entering[:, 0], ior, 1.0)
        cos_i = jnp.abs(d_dot_n[:, 0])
        refr_d, tir = sh.refract_dir(d, n_eff, n1 / n2)
        fres = jnp.where(tir, 1.0, sh.schlick_fresnel(cos_i, n1, n2))[:, None]

        w_refl = (is_mir * mats.mirror
                  + is_die * fres * mats.transparency) * hm
        refl_live = live & hit_mask & (mats.is_mirror | mats.is_dielectric)

        if branching:
            to = p - n_eff * SHADOW_EPS
            refr_ok = hm & is_die & ~tir[:, None]
            refr_safe = jnp.where(refr_ok, refr_d,
                                  jnp.asarray([0.0, 0.0, 1.0]))
            w_refr = (is_die * (1.0 - fres) * mats.transparency
                      * refr_ok.astype(jnp.float32))
            refr_live = live & hit_mask & mats.is_dielectric & ~tir
            o = jnp.concatenate([ro, to], axis=0)
            d = jnp.concatenate([rd_safe, refr_safe], axis=0)
            weight = jnp.concatenate([weight * w_refl, weight * w_refr],
                                     axis=0)
            parent = jnp.concatenate([parent, parent], axis=0)
            live = jnp.concatenate([refl_live, refr_live], axis=0)
            # dead-fork compaction: most children are exactly dead
            # (non-dielectric/non-mirror reflect weight 0, TIR refract
            # children, misses); sort the live-and-weighted lanes to the
            # front and truncate to the static cap so lane count stays
            # O(cap * n_rays) instead of 2^depth. Live lanes beyond the
            # cap (pathological full-screen dielectric chains) drop
            # weakest-first — standard throughput culling.
            cap = (cfg.tree_cap or 0) * n_rays
            if cap and o.shape[0] > cap:
                live = live & jnp.any(weight != 0.0, axis=-1)
                score = jnp.where(
                    live, jnp.sum(jnp.abs(weight), axis=-1), -1.0)
                n_truncated = n_truncated + jnp.maximum(
                    jnp.sum(live.astype(jnp.int32)) - cap, 0)
                # truncation is silent accuracy loss when it actually
                # fires (live weighted lanes beyond the cap are dropped
                # weakest-first) — make that detectable (advisor r3).
                # jax.debug.print lowers to a host callback, which the
                # remote-TPU (axon) backend rejects OUTRIGHT (the whole
                # render fails to compile, caught on-chip in r4) — emit
                # the warning only on the CPU backend, where CI runs and
                # callbacks always exist; the gate is a trace-time
                # constant.
                if jax.default_backend() == "cpu":
                    n_dropped = jnp.maximum(
                        jnp.sum(live.astype(jnp.int32)) - cap, 0)
                    jax.lax.cond(
                        n_dropped > 0,
                        lambda k: jax.debug.print(
                            "unity_raytracer_tpu: tree_cap={c} truncated "
                            "{k} live refraction lanes at level {l} "
                            "(raise cfg.tree_cap for exactness)",
                            c=cfg.tree_cap, k=k, l=level),
                        lambda k: None, n_dropped)
                order = jnp.argsort(-score)[:cap]
                # ONE gather of the packed per-lane state instead of
                # five: TPU row-gather cost scales with row COUNT, not
                # row width (cornell xprof, r4 — the five takes were
                # ~85ms/frame, the dominant tree-path cost)
                state = jnp.concatenate(
                    [o, d, weight,
                     jax.lax.bitcast_convert_type(
                         parent, jnp.float32)[:, None],
                     live.astype(jnp.float32)[:, None]], axis=1)
                sel = jnp.take(state, order, axis=0)
                o = sel[:, 0:3]
                d = sel[:, 3:6]
                weight = sel[:, 6:9]
                parent = jax.lax.bitcast_convert_type(sel[:, 9],
                                                      jnp.int32)
                live = sel[:, 10] > 0.5
        else:
            o, d = ro, rd_safe
            weight = weight * w_refl
            live = refl_live
    if with_stats:
        return acc, n_truncated
    return acc


def _dummy_packed(arity: int = 4):
    """1-row PackedBVH stand-in for meshless scenes on the fused tree
    kernel (has_mesh=False skips every walk; these arrays are never
    read). Host-side numpy at trace time — all-constant."""
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.pallas.traverse_mk3 import PackedBVH
    wide = np.zeros((1, 8 * arity), np.float32)
    wide[:, 7::8] = -1.0  # every child slot absent
    return PackedBVH(
        nodes=jnp.zeros((1, 16), jnp.float32),
        tris=jnp.zeros((1, 128), jnp.float32),
        leaf_prim=jnp.full((1, 14), -1, jnp.int32),
        bvh=bvhmod.build(np.zeros((0, 3, 3), np.float32)),
        leafmeta=jnp.zeros((1, 16), jnp.float32),
        wide=jnp.asarray(wide),
        leaf_tag=jnp.zeros((1,), jnp.float32),
        tris_bw=jnp.zeros((1, 128), jnp.float32),
        bw_tag=jnp.zeros((1,), jnp.float32))


def _trace_tree_mega(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                     cfg: RenderConfig, bvh=None) -> jnp.ndarray:
    """Level-synchronous Whitted tree on the FUSED fork kernel
    (ops/pallas/mega.trace_segment with fork=True): each level's
    nearest + shadows + shading + dielectric fork is ONE Pallas launch,
    replacing the per-level brute XLA work that dominated config 2
    after the r4 gather fixes (docs/KERNELS.md r4 tree section). The
    XLA side keeps only what it is good at: the parent scatter-add and
    the dead-fork compaction gather.

    ``bvh=None`` asserts a MESHLESS scene (cornell: spheres + loose
    triangles only) — the kernel runs with has_mesh=False and a dummy
    1-row PackedBVH. Forward-only and hard-visibility only; the
    composed ``_trace_tree`` remains the differentiable/general path.
    """
    import jax as _jax

    from unity_raytracer_tpu.ops.pallas.mega import (
        build_aux, trace_segment)

    n_rays = o.shape[0]
    has_mesh = bvh is not None and getattr(bvh, "leafmeta", None) is not None
    packed = bvh if has_mesh else _dummy_packed(max(cfg.bvh_arity, 2))
    aux = build_aux(scene, cfg.background)
    kw = dict(n_lights=scene.lights.positions.shape[0],
              n_spheres=scene.spheres.count,
              n_tris=scene.triangles.count,
              max_bounces=cfg.max_bounces,
              interpret=_jax.default_backend() == "cpu",
              tile_r=cfg.tile_r,
              use_wide=True,
              fuse_shadows=cfg.fuse_shadows,
              walk_unroll=cfg.walk_unroll,
              occ_mode=cfg.occ_mode,
              light_cull=cfg.light_cull,
              tri_isect=cfg.tri_isect if has_mesh else "mt",
              shadow_batch=cfg.shadow_batch,
              stale_prune=cfg.stale_prune,
              near_mode=cfg.near_mode,
              fork=True, has_mesh=has_mesh)

    # pad to whole kernel tiles once: the dead-tile compaction below
    # works at tile granularity
    tile = cfg.tile_r
    pad = (-n_rays) % tile
    z3 = jnp.zeros((pad, 3), jnp.float32).at[:, 2].set(1.0)
    o = jnp.concatenate([o, z3], axis=0) if pad else o
    d = jnp.concatenate([d, z3], axis=0) if pad else d
    n_tiles0 = o.shape[0] // tile
    # children inherit their parent's LANE SLOT and compaction moves
    # whole tiles (in-tile order preserved), so the lane->primary-ray
    # mapping is tile-granular: parent_tile[j] names the primary tile
    # lane j*tile..(j+1)*tile-1 folds into. The radiance scatter-add
    # then runs over a few hundred TILE rows instead of ~1M lanes —
    # per-lane scatters at that size were the measured dominant cost
    # of this path (r4 cornell xprof; r5 per-lane acc.at[parent].add).
    parent_tile = jnp.arange(n_tiles0, dtype=jnp.int32)
    acc = jnp.zeros((n_tiles0, tile, 3), jnp.float32)
    weight = jnp.concatenate(
        [jnp.ones((n_rays, 3), jnp.float32),
         jnp.zeros((pad, 3), jnp.float32)])
    tmax = jnp.concatenate(
        [jnp.full((n_rays,), 3.0e38, jnp.float32),
         jnp.full((pad,), -1.0, jnp.float32)])

    cap_tiles = -(-((cfg.tree_cap or 0) * n_rays) // tile)
    for level in range(cfg.max_bounces + 1):
        delta, ro, rd, w_re, tm_re, to, td, w_tr, tm_tr = trace_segment(
            packed, aux, level, o, d, weight, tmax, **kw)
        # pad tiles carry parent_tile 0 with weight 0 -> add nothing
        acc = acc.at[parent_tile].add(
            delta.reshape(-1, tile, 3), mode="drop")
        if level == cfg.max_bounces:
            break
        o = jnp.concatenate([ro, to], axis=0)
        d = jnp.concatenate([rd, td], axis=0)
        weight = jnp.concatenate([w_re, w_tr], axis=0)
        parent_tile = jnp.concatenate([parent_tile, parent_tile], axis=0)
        tmax = jnp.concatenate([tm_re, tm_tr], axis=0)
        # TILE-granular dead-fork compaction: drop all-dead tiles with
        # a cumsum + a few-hundred-row gather. The first fused-fork cut
        # used _trace_tree's per-lane argsort compaction, which
        # dominated the 512^2 frame (per-lane sorts at ~1M lanes);
        # row-gather cost scales with ROW COUNT (r4 lesson), and tiles
        # are the rows here. Live lanes are block-coherent (children
        # inherit their parent's slot), so live tiles are few; order
        # inside tiles is preserved. When the tile budget (tree_cap,
        # rounded up to tiles) overflows, LAST live tiles drop —
        # cruder than the composed path's weakest-weight-first lane
        # culling, but the shipped cornell cap is lossless anyway.
        n_tiles = o.shape[0] // tile
        if cap_tiles and n_tiles > cap_tiles:
            live_t = jnp.any((tmax >= 0.0).reshape(n_tiles, tile),
                             axis=1)
            pos = jnp.cumsum(live_t.astype(jnp.int32)) - 1
            src = jnp.where(live_t & (pos < cap_tiles), pos, cap_tiles)
            idx = jnp.zeros((cap_tiles + 1,), jnp.int32).at[src].set(
                jnp.arange(n_tiles, dtype=jnp.int32),
                mode="drop")[:cap_tiles]
            n_live = jnp.sum(live_t.astype(jnp.int32))
            slot_ok = jnp.arange(cap_tiles) < n_live
            state = jnp.concatenate(
                [o, d, weight, tmax[:, None]], axis=1)   # [n, 10]
            sel = jnp.take(state.reshape(n_tiles, tile * 10), idx,
                           axis=0).reshape(cap_tiles * tile, 10)
            o = sel[:, 0:3]
            d = sel[:, 3:6]
            weight = sel[:, 6:9]
            parent_tile = jnp.take(parent_tile, idx, axis=0)
            tmax = jnp.where(
                jnp.repeat(slot_ok, tile), sel[:, 9], -1.0)
    return acc.reshape(n_tiles0 * tile, 3)[:n_rays]


_HAS_DIELECTRIC_HINT: dict = {}


def scene_has_dielectrics_static(scene: Scene) -> bool:
    """Static (trace-time) dielectric hint.

    Inside jit the scene leaves are tracers, so the concrete flag must be
    decided before tracing; `trace_radiance` resolves cfg.mode='auto' outside
    jit and threads the decision through as the static ``mode``.
    """
    try:
        return scene.has_dielectrics  # concrete scene
    except jax.errors.TracerArrayConversionError:
        return True  # conservative under jit if mode was not resolved


def resolve_mode(scene: Scene, cfg: RenderConfig) -> RenderConfig:
    """Resolve mode='auto' on a concrete scene (call outside jit)."""
    if cfg.mode != "auto":
        return cfg
    try:
        tree = scene.has_dielectrics
    except jax.errors.TracerArrayConversionError as e:
        raise ValueError(
            "RenderConfig.mode='auto' must be resolved on a concrete scene "
            "before jit; call resolve_mode() first.") from e
    return cfg.with_(mode="tree" if tree else "scan")


@partial(jax.jit, static_argnames=("cfg",))
def trace_radiance(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                   cfg: RenderConfig, bvh=None) -> jnp.ndarray:
    """Radiance [N,3] (0-255 scale) for arbitrary ray batches."""
    mode = cfg.mode
    if mode == "auto":  # under jit this must have been resolved already
        mode = "tree"
    if mode == "scan":
        return _trace_chain(scene, o, d, cfg, bvh=bvh)
    if (cfg.kernel == "mega" and cfg.diff.soft_hit_temp == 0.0
            and cfg.diff.soft_shadow_temp == 0.0):
        # fused fork kernel: hard forward only; bvh=None asserts a
        # meshless scene (see _trace_tree_mega)
        return _trace_tree_mega(scene, o, d, cfg, bvh=bvh)
    return _trace_tree(scene, o, d, cfg, 0, bvh=bvh)


@partial(jax.jit, static_argnames=("cfg",))
def trace_radiance_stats(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                         cfg: RenderConfig, bvh=None):
    """Scan-mode trace that also returns per-segment (live nearest lanes,
    live shadow lanes) counts — bench.py's honest-ray-accounting probe."""
    return _trace_chain(scene, o, d, cfg, bvh=bvh, with_stats=True)


@partial(jax.jit, static_argnames=("cfg",))
def trace_radiance_tree_stats(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                              cfg: RenderConfig, bvh=None):
    """Tree-mode trace returning ``(radiance [N,3], n_truncated [])`` —
    the count of live weighted lanes the tree_cap compaction dropped
    (accuracy loss iff > 0). A plain array output, so it works on
    backends that reject host callbacks (the remote-TPU backend rejects
    jax.debug.print outright); bench.py and tests consume it."""
    return _trace_tree(scene, o, d, cfg, 0, bvh=bvh, with_stats=True)


@partial(jax.jit, static_argnames=("cfg",))
def _frame_core(scene: Scene, cam: Camera, cfg: RenderConfig,
                bvh=None) -> jnp.ndarray:
    """Jitted block-order raygen -> trace -> unswizzle -> [H,W,3] image.

    No gathers anywhere: rays are generated directly in pixel-block order
    (models/camera.generate_rays_blocks, integer lane math) and the image
    is restored with one reshape+transpose (utils/swizzle.unswizzle_image).
    """
    from unity_raytracer_tpu.utils.swizzle import unswizzle_image
    with jax.named_scope("raygen"):
        o, d = generate_rays_blocks(cam, cfg.block_size)
    rad = trace_radiance(scene, o, d, cfg, bvh=bvh)
    with jax.named_scope("image_assembly"):
        return unswizzle_image(rad, cam.width, cam.height,
                               cfg.block_size) / 255.0


def render_frame(scene: Scene, cam: Camera, cfg: RenderConfig,
                 bvh=None) -> jnp.ndarray:
    """Full-frame render, one jit: the benchmark's timed unit.

    Primary rays are emitted in ``cfg.block_size``-square screen-block lane
    order so every packet-kernel tile covers a compact square of pixels;
    the image is un-swizzled by a pure relayout on the way out. Exact same
    image as row-major order.
    """
    cfg = resolve_mode(scene, cfg)
    return _frame_core(scene, cam, cfg, bvh)


def render(scene: Scene, cam: Camera, cfg: RenderConfig,
           bvh=None) -> jnp.ndarray:
    """Render the full image [H,W,3] on the display (0-1) scale.

    Host-side wrapper: resolves 'auto' mode, builds the BVH if
    ``cfg.use_bvh`` and none was passed, and jit-runs the block-ordered
    frame — chunked over rays if ``cfg.ray_chunk`` bounds the working set.
    """
    cfg = resolve_mode(scene, cfg)
    if cfg.use_bvh and bvh is None:
        from unity_raytracer_tpu.ops import bvh as bvhmod
        bvh = bvhmod.prepare_bvh(scene, cfg)
    n = cam.width * cam.height
    if cfg.ray_chunk and cfg.ray_chunk < n:
        return _frame_chunked(scene, cam, cfg, bvh)
    return _frame_core(scene, cam, cfg, bvh)


@partial(jax.jit, static_argnames=("cfg",))
def _frame_chunked(scene: Scene, cam: Camera, cfg: RenderConfig,
                   bvh=None) -> jnp.ndarray:
    """Chunked frame (bounded working set): lax.map over ray chunks.

    One jit like _frame_core — raygen compiles in the same context both
    ways, so chunked and unchunked images agree to FP-reassociation
    noise (tested at rtol 1e-6 in practice).
    """
    from unity_raytracer_tpu.utils.swizzle import unswizzle_image
    o, d = generate_rays_blocks(cam, cfg.block_size)
    total = o.shape[0]
    c = cfg.ray_chunk
    pad = (-total) % c
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)
                             .at[:, 2].set(1.0)], axis=0)
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)
                             .at[:, 2].set(1.0)], axis=0)
    oc = o.reshape(-1, c, 3)
    dc = d.reshape(-1, c, 3)
    rad = jax.lax.map(
        lambda od: trace_radiance(scene, od[0], od[1], cfg, bvh=bvh),
        (oc, dc)).reshape(-1, 3)[:total]
    img = unswizzle_image(rad, cam.width, cam.height, cfg.block_size)
    return img / 255.0
