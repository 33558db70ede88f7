"""Round-5 AOT session J: structural overlap experiment for the grad
all-reduce (VERDICT r4 #4), after both flag routes were blocked by the
environment (tpu_r5i.jsonl: remote compile-options whitelist rejects
the combiner threshold; local XLA_FLAGS registry aborts on TPU-internal
flag names — only the GPU-named variant parses, which the TPU pass
ignores).

Experiment: MICROBATCHED grad accumulation over a lax.scan. Each
microbatch's backward issues its own shard_map grad psum inside the
scan body; XLA cannot sink a collective out of a while body, and the
latency-hiding scheduler may software-pipeline iteration i's
all-reduce against iteration i+1's backward compute. Greps the
v5e:2x4-scheduled module for async all-reduce forms both in the body
and at top level, and records the schedule either way.

Usage: python scripts/tpu_run.py scripts/tpu_r5j_aot.py [out.jsonl]
"""

import gzip
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r5j.jsonl"


def emit(**rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec, default=float) + "\n")
    print(json.dumps(rec, default=float), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from unity_raytracer_tpu.fit import get_params, set_params
    from unity_raytracer_tpu.models.presets import mesh_scene
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.bvh import bind_verts
    from unity_raytracer_tpu.ops.render import resolve_mode, trace_radiance
    from unity_raytracer_tpu.parallel.shard import RAY_AXIS

    emit(step="init", devices=str(jax.devices()))
    from jax.experimental import topologies
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    devs = np.array(list(topo.devices))
    mesh = Mesh(devs.reshape(-1, 1), ("dp", "tp"))

    s3, cam3, cfg3 = mesh_scene(102400, width=64, height=64)
    cfg3 = resolve_mode(s3, cfg3.with_(
        use_bvh=True, kernel="xla", max_bounces=1, bvh_pad=0.1))
    bvh3 = bvhmod.prepare_bvh(s3, cfg3)
    names = ("mesh_verts", "sphere_centers", "sphere_diffuse")
    params_c = get_params(s3, names)
    tx = optax.adam(1e-2)
    n = 64 * 64
    n_mb = 4                      # microbatches per step
    sh_r = NamedSharding(mesh, P(None, "dp"))   # [mb, rays/mb, 3]
    sh_rep = NamedSharding(mesh, P())

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
             out_specs=P(), check_vma=False)
    def mb_loss(params, o_, d_, tgt_):
        scene = set_params(s3, params)
        b = bind_verts(bvh3, scene)
        rad = trace_radiance(scene, o_, d_, cfg3, bvh=b) / 255.0
        sse = jnp.sum((rad - tgt_) ** 2)
        return jax.lax.psum(sse, RAY_AXIS) / (n * 3)

    @jax.jit
    def step(params, opt_state, o_mb, d_mb, tgt_mb):
        # grad ACCUMULATION over microbatches: each iteration's
        # backward carries its own grad psum (collectives cannot be
        # hoisted/combined across while-loop iterations)
        def body(carry, mb):
            acc, loss_acc = carry
            o_, d_, t_ = mb
            l, g = jax.value_and_grad(
                lambda p: mb_loss(p, o_, d_, t_))(params)
            acc = jax.tree.map(jnp.add, acc, g)
            return (acc, loss_acc + l), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (grads, loss), _ = jax.lax.scan(
            body, (zeros, 0.0), (o_mb, d_mb, tgt_mb))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params_a = {k: jax.ShapeDtypeStruct(np.shape(v), jnp.float32,
                                        sharding=sh_rep)
                for k, v in params_c.items()}
    ray_a = jax.ShapeDtypeStruct((n_mb, n // n_mb, 3), jnp.float32,
                                 sharding=sh_r)
    opt_a = jax.eval_shape(tx.init, params_a)
    opt_a = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                       sharding=sh_rep), opt_a)
    try:
        lowered = step.lower(params_a, opt_a, ray_a, ray_a, ray_a)
        compiled = lowered.compile()
        txt = compiled.as_text()
        lines = txt.splitlines()
        starts = [i for i, l in enumerate(lines)
                  if "all-reduce-start" in l]
        dones = [i for i, l in enumerate(lines)
                 if "all-reduce-done" in l]
        n_sync = sum(" all-reduce(" in l for l in lines)
        gaps = []
        for si in starts[:12]:
            di = next((j for j in dones if j > si), None)
            if di is not None:
                body_ops = [l.strip().split(" = ")[0]
                            for l in lines[si + 1:di] if " = " in l]
                big = [b for b in body_ops
                       if any(k in b for k in ("fusion", "while",
                                               "dot", "convolution"))]
                gaps.append({"start": lines[si].strip()[:160],
                             "n_ops_between": len(body_ops),
                             "n_compute_between": len(big),
                             "compute_sample": big[:8]})
        path = ("/root/repo/docs/measurements/"
                "aot_overlap_r5_microbatch.txt.gz")
        with gzip.open(path, "wt") as f:
            f.write(txt)
        emit(step="aot_mb", ok=True, n_mb=n_mb, n_lines=len(lines),
             n_sync_all_reduce=n_sync, n_starts=len(starts),
             n_dones=len(dones), gaps=gaps, hlo_path=path)
    except Exception as e:
        emit(step="aot_mb", ok=False, error=repr(e)[:600])

    emit(step="done")


if __name__ == "__main__":
    main()
