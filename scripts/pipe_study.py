"""Dissect the raygen->unswizzle pipeline with in-jit serialized repeats.

Each probe runs its body K times inside ONE jit with a data dependency
chained through a scalar carry (prevents CSE/hoisting), so the per-call
dispatch floor is amortized and layouts stay internal.

Usage: python scripts/pipe_study.py [out.jsonl]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipe_study.jsonl"
K = 8


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

    from unity_raytracer_tpu.models.camera import generate_rays_blocks
    from unity_raytracer_tpu.models.presets import mesh100k
    from unity_raytracer_tpu.utils.swizzle import unswizzle_image

    scene, cam, cfg = mesh100k()
    bs = cfg.block_size
    emit(step="init", devices=str(jax.devices()), k=K)

    def bench(name, body):
        """body(eps scalar) -> scalar; run K times chained."""
        @jax.jit
        def run(e0):
            def it(i, e):
                return e * 1e-30 + body(e)
            return jax.lax.fori_loop(0, K, it, e0)
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(jnp.float32(0.0)))
        _ = float(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(jnp.float32(0.0))
        _ = float(out)
        per = (time.perf_counter() - t0) / K
        emit(step=name, compile_s=compile_s, per_iter_s=per)

    def raygen(e):
        # perturb cam position by e so iterations can't be CSE'd
        import dataclasses
        cam2 = dataclasses.replace(cam, dist=cam.dist + e)
        return generate_rays_blocks(cam2, bs)

    bench("raygen_scalar_out",
          lambda e: raygen(e)[1].sum())

    def pipe_full(e):
        o, d = raygen(e)
        rad = jnp.abs(d) * 255.0
        img = unswizzle_image(rad, cam.width, cam.height, bs) / 255.0
        return img.sum()
    bench("pipe_hw3_sum", pipe_full)

    def pipe_soa(e):
        # SoA end to end: no [N,3] stack, per-channel unswizzle to [3,H,W]
        import dataclasses
        cam2 = dataclasses.replace(cam, dist=cam.dist + e)
        w, h = cam2.width, cam2.height
        wp = -(-w // bs) * bs
        hp = -(-h // bs) * bs
        n = wp * hp
        lane = jnp.arange(n, dtype=jnp.int32)
        wb = wp // bs
        blk = lane // (bs * bs)
        off = lane % (bs * bs)
        y = (blk // wb) * bs + off // bs
        x = (blk % wb) * bs + off % bs
        center = cam2.position + cam2.forward * cam2.dist
        tl = center - cam2.right * cam2.half_h + cam2.up * cam2.half_v
        xs = (x.astype(jnp.float32) + 0.5) * (2.0 * cam2.half_h / w)
        ys = (y.astype(jnp.float32) + 0.5) * (2.0 * cam2.half_v / h)
        dx = (tl[0] + xs * cam2.right[0] - ys * cam2.up[0]) - cam2.position[0]
        dy = (tl[1] + xs * cam2.right[1] - ys * cam2.up[1]) - cam2.position[1]
        dz = (tl[2] + xs * cam2.right[2] - ys * cam2.up[2]) - cam2.position[2]
        nrm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        chans = []
        for c in (dx, dy, dz):
            r = jnp.abs(c / nrm)
            ch = jnp.transpose(r.reshape(hp // bs, wp // bs, bs, bs),
                               (0, 2, 1, 3)).reshape(hp, wp)[:h, :w]
            chans.append(ch)
        return sum(ch.sum() for ch in chans)
    bench("pipe_soa_chw_sum", pipe_soa)

    # cost of materializing [H,W,3] vs [3,H,W] as the JIT OUTPUT
    o, d = generate_rays_blocks(cam, bs)

    @jax.jit
    def out_hw3(d):
        return unswizzle_image(jnp.abs(d), cam.width, cam.height, bs)

    @jax.jit
    def out_3hw(d):
        img = unswizzle_image(jnp.abs(d), cam.width, cam.height, bs)
        return jnp.transpose(img, (2, 0, 1))

    for name, f in (("out_hw3", out_hw3), ("out_3hw", out_3hw)):
        t0 = time.perf_counter()
        r = jax.block_until_ready(f(d))
        _ = np.asarray(r).ravel()[0]
        c = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = jax.block_until_ready(f(d))
            _ = np.asarray(r).ravel()[0]
            times.append(time.perf_counter() - t0)
        emit(step=name, compile_s=c, time_s=min(times))

    emit(step="done")


if __name__ == "__main__":
    main()
