"""A/B the composed differentiable path's traversal kernel (flagship,
chunked+remat grad): mk4 binary ('pallas') vs wide BVH4 ('wide').

The composed path is the soft-temp fitting path; its forward re-walks
the BVH per segment, so the wide walk's step-count win should carry.

Usage: python scripts/tpu_run.py scripts/tpu_composed_ab.py [out.jsonl]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_composed_ab.jsonl"
ISSUED = 1920 * 1080 * 5 * 4


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
    emit(step="init", devices=str(jax.devices()))

    from unity_raytracer_tpu.fit import (get_params,
                                         make_chunked_value_and_grad)
    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import resolve_mode, trace_radiance

    scene, cam, cfg0 = mesh100k()
    cfg0 = resolve_mode(scene, cfg0.with_(use_bvh=True))
    packed = bvhmod.prepare_bvh(scene, cfg0.with_(kernel="mega"))
    names = ("sphere_centers", "sphere_diffuse", "light_intensities")
    params0 = get_params(scene, names)
    o, d = generate_rays_blocks(cam, cfg0.block_size)

    ref_loss = None
    for kern in ("pallas", "wide", "pallas3"):
        try:
            cfg = cfg0.with_(kernel=kern, remat=True)
            target = jax.block_until_ready(jax.lax.stop_gradient(
                trace_radiance(scene, o, d, cfg, bvh=packed))) * 0.9
            vg = jax.jit(make_chunked_value_and_grad(
                scene, cfg, o, d, target, bvh=packed, chunk=1 << 18))
            t0 = time.perf_counter()
            out = vg(params0)
            loss = float(out[0])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = vg(params0)
            _ = float(out[0])
            dt = time.perf_counter() - t0
            if ref_loss is None:
                ref_loss = loss
            emit(step="composed_ab", kernel=kern, grad_s=dt,
                 rays_per_s_fwd_bwd=ISSUED / dt, compile_s=compile_s,
                 loss=loss, loss_drift=abs(loss - ref_loss))
        except Exception as e:
            emit(step="composed_ab", kernel=kern, error=repr(e)[:250])
    emit(step="done")


if __name__ == "__main__":
    main()
