"""A/B the wide (BVH4/8) megakernel walks + fused shadow walk vs the
binary mk4 walks on the flagship scene (TPU). Variants are selected via
the STATIC RenderConfig (bvh_arity / fuse_shadows), so each gets its own
jit cache entry — a trace-time monkeypatch would silently reuse the
previous variant's executable (measured: identical timing + bitwise-equal
image on the first attempt of this script).

Emits JSONL: frame time per variant + max|diff| vs the binary image.

Usage: python scripts/wide_ab.py [out.jsonl] [variants...]
variants: bin wide4 wide4nf wide8 (default: all)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wide_ab.jsonl"
VARIANTS = sys.argv[2:] or ["bin", "wide4", "wide4nf", "wide8"]


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

    def timed(fn, reps=5):
        def sync(out):
            out = jax.block_until_ready(out)
            return float(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        sync(fn())
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn())
            times.append(time.perf_counter() - t0)
        return compile_s, min(times)

    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import render_frame, resolve_mode
    from unity_raytracer_tpu.ops.pallas.traverse_wide import widen

    scene, cam, cfg0 = mesh100k()
    cfg0 = resolve_mode(scene, cfg0.with_(use_bvh=True, kernel="mega"))
    emit(step="init", devices=str(jax.devices()))

    ISSUED = 41472000
    packed4 = bvhmod.prepare_bvh(scene, cfg0)  # wide arity 4
    packed8 = widen(packed4, arity=8)
    emit(step="bvh", nodes=list(packed4.nodes.shape),
         wide4=list(packed4.wide.shape), wide8=list(packed8.wide.shape))

    # (name, cfg, packed)
    CFGS = {
        "bin": (cfg0.with_(bvh_arity=0), packed4),
        "wide4": (cfg0.with_(bvh_arity=4), packed4),
        "wide4nf": (cfg0.with_(bvh_arity=4, fuse_shadows=False), packed4),
        "wide8": (cfg0.with_(bvh_arity=8), packed8),
    }

    imgs = {}
    for name in VARIANTS:
        cfg, pk = CFGS[name]
        try:
            c, tmin = timed(lambda: render_frame(scene, cam, cfg, bvh=pk))
            imgs[name] = jax.block_until_ready(
                render_frame(scene, cam, cfg, bvh=pk))
            emit(step=name, compile_s=c, min_s=tmin,
                 rays_per_s=ISSUED / tmin)
        except Exception as e:
            emit(step=name, error=repr(e)[:500])

    base = imgs.get("bin")
    for name, img in imgs.items():
        if base is not None and name != "bin":
            diff = float(jnp.max(jnp.abs(img - base)))
            emit(step=f"parity_{name}", max_abs_diff=diff)
    emit(step="done")


if __name__ == "__main__":
    main()
