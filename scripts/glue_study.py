"""Microbench the XLA glue around the traversal kernels on TPU.

The r2 measurement session showed: frame 4.1s, but useful traversal
launches only ~0.6s. This times each glue candidate in isolation at the
flagship lane count (2,073,600) to find the 3.5s.

Usage: python scripts/glue_study.py [out.jsonl]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/glue_study.jsonl"


def emit(**rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec, default=float) + "\n")
    print(json.dumps(rec, default=float), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def timed(fn, *a, reps=4):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        mean = (time.perf_counter() - t0) / reps
        return compile_s, mean

    N = 2073600
    key = jax.random.PRNGKey(0)
    lane = jax.random.permutation(key, jnp.arange(N, dtype=jnp.int32))
    vals = jnp.ones((N, 3), jnp.float32)
    live = (jax.random.uniform(key, (N,)) < 0.06)
    emit(step="init", devices=str(jax.devices()), n=N)

    # 1. scatter-add [N,3] at permuted rows (the per-segment acc update)
    f = jax.jit(lambda l, v: jnp.zeros((N, 3), jnp.float32)
                .at[l].add(v, unique_indices=True))
    c, t = timed(f, lane, vals)
    emit(step="scatter_add_perm", compile_s=c, time_s=t)

    # 1b. scatter-add at IDENTITY rows (does XLA see through it?)
    ident = jnp.arange(N, dtype=jnp.int32)
    c, t = timed(f, ident, vals)
    emit(step="scatter_add_ident", compile_s=c, time_s=t)

    # 2. _live_first_perm (2 cumsums + unique scatter of arange)
    def lfp(live):
        live_i32 = live.astype(jnp.int32)
        live_pos = jnp.cumsum(live_i32) - 1
        dead_pos = jnp.cumsum(1 - live_i32) - 1
        n_live = live_pos[-1] + 1
        pos = jnp.where(live, live_pos, n_live + dead_pos)
        return (jnp.zeros((N,), jnp.int32)
                .at[pos].set(jnp.arange(N, dtype=jnp.int32),
                             unique_indices=True))
    f = jax.jit(lfp)
    c, t = timed(f, live)
    emit(step="live_first_perm", compile_s=c, time_s=t)

    # 2b. argsort alternative
    f = jax.jit(lambda lv: jnp.argsort(1 - lv.astype(jnp.int32),
                                       stable=True))
    c, t = timed(f, live)
    emit(step="argsort_perm", compile_s=c, time_s=t)

    # 3. gather [N,3] by permutation (the per-segment take())
    f = jax.jit(lambda v, l: jnp.take(v, l, axis=0))
    c, t = timed(f, vals, lane)
    emit(step="gather_perm_1x", compile_s=c, time_s=t)

    # 4. one full segment of shading glue, no traversal: local radiance
    from unity_raytracer_tpu.models.camera import generate_rays
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops.render import _local_radiance, resolve_mode
    from unity_raytracer_tpu.ops.intersect import Hit, KIND_MESH

    scene, cam, cfg = mesh100k()
    cfg = resolve_mode(scene, cfg.with_(use_bvh=True))
    o, d = generate_rays(cam)
    hit = Hit(t=jnp.full((N,), 5.0), kind=jnp.full((N,), KIND_MESH,
                                                   jnp.int32),
              index=jnp.zeros((N,), jnp.int32),
              mesh_index=jnp.zeros((N,), jnp.int32))
    active = jnp.ones((N,), bool)

    # shading WITHOUT the shadow traversal: bvh=None makes shadow_min_t
    # brute-force -> too slow; instead time direct_lighting's math by
    # replacing shadow_min_t via a huge t_max cull (all lanes culled)
    def seg_masked(o, d, active):
        out, ns = _local_radiance(scene, o, d, cfg, hit, bvh=None,
                                  active=jnp.zeros((N,), bool),
                                  with_stats=True)
        return out[0], ns
    # NOTE: bvh=None + mask all-off still brute-forces spheres/tris per
    # shadow lane; mesh brute force over 100k tris would dominate --
    # skip this probe if it compiles something absurd; keep small reps.
    try:
        f = jax.jit(seg_masked)
        c, t = timed(f, o, d, active, reps=2)
        emit(step="local_radiance_masked_nobvh", compile_s=c, time_s=t)
    except Exception as e:
        emit(step="local_radiance_masked_nobvh", error=str(e)[:200])

    # 5. surface_attributes alone
    from unity_raytracer_tpu.ops import shade as sh
    f = jax.jit(lambda p: sh.surface_attributes(scene, p, hit))
    c, t = timed(f, o + d * 5.0)
    emit(step="surface_attributes", compile_s=c, time_s=t)

    # 6. direct_lighting math only (mock shadow min_t as all +inf):
    def dl_math(p, n, v):
        L = scene.lights.positions.shape[0]
        mats = sh.surface_attributes(scene, p, hit)[1]
        color = mats.ambient * scene.lights.ambient[None, :]
        lvec = scene.lights.positions[None, :, :] - p[:, None, :]
        ldist_sq = jnp.sum(lvec * lvec, axis=-1)
        ldist = jnp.sqrt(ldist_sq)
        ldir = lvec / ldist[..., None]
        ln = jnp.sum(ldir * n[:, None, :], axis=-1)
        irr = scene.lights.intensities[None, :, :] / ldist_sq[..., None]
        diffuse = (mats.diffuse[:, None, :]
                   * jnp.maximum(0.0, ln)[..., None] * irr)
        hv = ldir + v[:, None, :]
        hv = hv / jnp.maximum(jnp.linalg.norm(hv, axis=-1, keepdims=True),
                              1e-30)
        nh = jnp.maximum(0.0, jnp.sum(n[:, None, :] * hv, axis=-1))
        spec = (mats.specular[:, None, :]
                * (nh ** mats.phong[:, None])[..., None] * irr)
        return color + jnp.sum(diffuse + spec, axis=1)
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    f = jax.jit(dl_math)
    c, t = timed(f, o + d * 5.0, nrm, -d)
    emit(step="direct_lighting_math", compile_s=c, time_s=t)

    # 7. nearest_hit full (bvh) at flagship: the real per-segment query
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.intersect import nearest_hit
    packed = bvhmod.prepare_bvh(scene, cfg)
    f = jax.jit(lambda o, d: nearest_hit(scene, o, d, bvh=packed,
                                         kernel=cfg.kernel))
    c, t = timed(f, o, d)
    emit(step="nearest_hit_full", compile_s=c, time_s=t)

    # 8. all-dead traversal launch (t_max=-1 everywhere): the scan's cost
    # for segments 2-4
    from unity_raytracer_tpu.ops.pallas.traverse_mk4 import traverse_packet4
    tm = jnp.full((N,), -1.0, jnp.float32)
    f = jax.jit(lambda o, d, tm: traverse_packet4(packed, o, d, t_max=tm))
    c, t = timed(f, o, d, tm)
    emit(step="trav4_all_dead", compile_s=c, time_s=t)

    # 9. cumsum alone
    f = jax.jit(lambda lv: jnp.cumsum(lv.astype(jnp.int32)))
    c, t = timed(f, live)
    emit(step="cumsum", compile_s=c, time_s=t)

    emit(step="done")


if __name__ == "__main__":
    main()
