"""Round-5 AOT session I: force the combined grad all-reduce to SPLIT
so the v5e latency-hiding scheduler can emit async start/done pairs.

r5h finding: with mesh_verts ([102400,3,3] = 3.7MB) among the grads,
XLA's all-reduce COMBINER still folds every bucket + the loss scalar
into ONE tuple all-reduce at the tail of backward — sync is then the
only correct schedule (nothing independent remains). This session
sweeps xla_all_reduce_combine_threshold_bytes (and the async-collective
knobs) via compiler_options to split the 3.7MB bucket from the small
ones, then counts all-reduce-start/done pairs and the compute
scheduled between them.

Usage: python scripts/tpu_run.py scripts/tpu_r5i_aot.py [out.jsonl]
"""

import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# compile-option route rejected by the PJRT client ("No such compile
# option", tpu_r5i.jsonl) — set the combiner threshold process-wide via
# XLA_FLAGS before jax/backend import instead (picked up by the
# compiler the AOT lowering invokes)
SPLIT = os.environ.get("AR_SPLIT", "65536")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_all_reduce_combine_threshold_bytes={SPLIT}")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r5i.jsonl"


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

    from unity_raytracer_tpu.fit import get_params
    from unity_raytracer_tpu.models.presets import mesh_scene
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import resolve_mode
    from unity_raytracer_tpu.parallel.shard import make_sharded_train_step

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
    sh_r = NamedSharding(mesh, P("dp"))
    sh_rep = NamedSharding(mesh, P())
    params_a = {k: jax.ShapeDtypeStruct(np.shape(v), jnp.float32,
                                        sharding=sh_rep)
                for k, v in params_c.items()}
    ray_a = jax.ShapeDtypeStruct((n, 3), jnp.float32, sharding=sh_r)
    opt_a = jax.eval_shape(tx.init, params_a)
    opt_a = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                       sharding=sh_rep), opt_a)
    step = make_sharded_train_step(s3, cam3, cfg3, None, mesh, names,
                                   tx, bvh=bvh3)
    lowered = step.lower(params_a, opt_a, ray_a, ray_a, ray_a)

    option_sets = [(f"envsplit{SPLIT}", None)]
    for tag, opts in option_sets:
        try:
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
            txt = compiled.as_text()
            lines = txt.splitlines()
            starts = [i for i, l in enumerate(lines)
                      if "all-reduce-start" in l]
            dones = [i for i, l in enumerate(lines)
                     if "all-reduce-done" in l]
            n_ar = sum(" all-reduce(" in l for l in lines)
            gaps = []
            for si in starts[:12]:
                di = next((j for j in dones if j > si), None)
                if di is not None:
                    body = [l.strip().split(" = ")[0]
                            for l in lines[si + 1:di] if " = " in l]
                    big = [b for b in body
                           if any(k in b for k in
                                  ("fusion", "while", "dot",
                                   "convolution"))]
                    gaps.append({
                        "start": lines[si].strip()[:140],
                        "n_ops_between": len(body),
                        "n_compute_between": len(big),
                        "compute_sample": big[:8]})
            path = ("/root/repo/docs/measurements/"
                    f"aot_overlap_r5_{tag}.txt.gz")
            if starts:
                with gzip.open(path, "wt") as f:
                    f.write(txt)
            emit(step="aot_opt", tag=tag, n_lines=len(lines),
                 n_sync_all_reduce=n_ar, n_starts=len(starts),
                 n_dones=len(dones), gaps=gaps,
                 hlo_path=path if starts else None)
        except Exception as e:
            emit(step="aot_opt", tag=tag, error=repr(e)[:400])

    emit(step="done")


if __name__ == "__main__":
    main()
