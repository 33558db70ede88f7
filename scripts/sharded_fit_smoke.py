"""Frame-scale sharded-fit smoke (VERDICT r4 weak #6 / r5 ask #8).

Runs ``make_sharded_train_step`` on the CONFIG-5 shape — the 100k-tri
BVH scene at full 1080p — over the virtual 8-device CPU mesh, a few
real optimizer steps, and records wall-clock + peak RSS to
``docs/measurements/sharded_fit_smoke_r5.json``.

Honest caveats (recorded in the artifact): virtual CPU devices prove
the memory/sharding story end-to-end (the step compiles, executes, and
descends at frame scale), NOT real scaling — all 8 "devices" share this
host's two cores, so wall-clock is an upper bound with no ICI in play.
Depth is reduced to 1 to keep the CPU wall-clock tractable; the lane
count (2.07M rays) and parameter classes are the config-5 ones.

Usage: python scripts/sharded_fit_smoke.py [steps]
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from unity_raytracer_tpu.fit import get_params
    from unity_raytracer_tpu.models.camera import generate_rays
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import render, resolve_mode
    from unity_raytracer_tpu.parallel import mesh as meshmod
    from unity_raytracer_tpu.parallel.shard import make_sharded_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    t_all = time.time()
    scene, cam, cfg = mesh100k()
    # depth 1 keeps the CPU smoke tractable; rays stay full 1080p
    cfg = resolve_mode(scene, cfg.with_(
        use_bvh=True, kernel="xla", max_bounces=1, remat=True))
    bvh = bvhmod.prepare_bvh(scene, cfg)
    mesh = meshmod.make_mesh((8, 1))

    t0 = time.time()
    target = np.asarray(render(scene, cam, cfg, bvh=bvh))
    target_s = time.time() - t0

    names = ("sphere_centers", "sphere_diffuse", "light_intensities")
    params = {k: v + 0.05 for k, v in
              get_params(scene, names).items()}
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    o, d = generate_rays(cam)
    ray_sh = NamedSharding(mesh, P("dp"))
    o = jax.device_put(o, ray_sh)
    d = jax.device_put(d, ray_sh)
    tgt = jax.device_put(jnp.asarray(target.reshape(-1, 3)), ray_sh)

    step = make_sharded_train_step(scene, cam, cfg, None, mesh, names,
                                   tx, bvh=bvh)
    losses = []
    t0 = time.time()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, o, d, tgt)
        losses.append(float(loss))
        print(f"step {i} loss {float(loss):.6e} "
              f"({time.time() - t0:.0f}s)", flush=True)
    wall = time.time() - t0
    peak_rss_gb = resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / 1e6

    rec = {
        "what": "config-5 sharded fit smoke: mesh100k (102400-tri BVH) "
                "at FULL 1920x1080 (2.07M rays), 8-device virtual CPU "
                "mesh, make_sharded_train_step (rays over dp, grad "
                "psum in shard_map backward), depth 1, composed XLA "
                "path + remat",
        "caveat": "virtual CPU devices on a 2-core host: proves the "
                  "memory story and that the step compiles/executes/"
                  "descends at frame scale — NOT a scaling number "
                  "(no real ICI; wall-clock is an upper bound)",
        "devices": 8,
        "steps": steps,
        "losses": losses,
        "descending": bool(len(losses) < 2 or losses[-1] <= losses[0]),
        "target_render_s": round(target_s, 1),
        "fit_wall_s": round(wall, 1),
        "s_per_step_incl_compile": round(wall / max(steps, 1), 1),
        "peak_rss_gb": round(peak_rss_gb, 2),
        "total_wall_s": round(time.time() - t_all, 1),
    }
    out = "/root/repo/docs/measurements/sharded_fit_smoke_r5.json"
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
