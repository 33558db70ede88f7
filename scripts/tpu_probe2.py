"""Probe 2: layout + pallas-pipeline hypotheses behind the glue costs.

H1: [N,3] f32 arrays are lane-padded to 128 -> elementwise/gather ops pay
    ~42x the logical bytes. Compare [N,3] vs SoA 3x[N] vs [3,N].
H2: every pallas grid step re-fetches constant (rep-BlockSpec) blocks ->
    all-dead traversal costs 0.115s. Compare dummy kernels with/without a
    6.6MB rep block at TILE 1024 vs 8192, and dimension_semantics.

Usage: python scripts/tpu_probe2.py [out.jsonl]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_probe2.jsonl"


def emit(**rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec, default=float) + "\n")
    print(json.dumps(rec, default=float), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def timed(fn, *a, reps=6):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        return compile_s, (time.perf_counter() - t0) / reps

    N = 2073600
    emit(step="init", devices=str(jax.devices()))

    key = jax.random.PRNGKey(0)
    a3 = jax.random.normal(key, (N, 3), jnp.float32)
    b3 = jax.random.normal(key, (N, 3), jnp.float32)
    ax, ay, az = a3[:, 0], a3[:, 1], a3[:, 2]
    bx, by, bz = b3[:, 0], b3[:, 1], b3[:, 2]
    a3t = jnp.asarray(a3.T)  # [3,N]
    b3t = jnp.asarray(b3.T)

    # --- H1: elementwise normalize, three layouts -------------------------
    f = jax.jit(lambda a: a / jnp.linalg.norm(a, axis=-1, keepdims=True))
    c, t = timed(f, a3)
    emit(step="normalize_N3", compile_s=c, time_s=t)

    def norm_soa(x, y, z):
        inv = jax.lax.rsqrt(x * x + y * y + z * z)
        return x * inv, y * inv, z * inv
    f = jax.jit(norm_soa)
    c, t = timed(f, ax, ay, az)
    emit(step="normalize_soa", compile_s=c, time_s=t)

    f = jax.jit(lambda a: a / jnp.linalg.norm(a, axis=0, keepdims=True))
    c, t = timed(f, a3t)
    emit(step="normalize_3N", compile_s=c, time_s=t)

    # dot product chains (cross + dot, shading-ish mix)
    def cross_dot_n3(a, b):
        cr = jnp.cross(a, b)
        return jnp.sum(cr * a, axis=-1)
    f = jax.jit(cross_dot_n3)
    c, t = timed(f, a3, b3)
    emit(step="crossdot_N3", compile_s=c, time_s=t)

    def cross_dot_soa(ax, ay, az, bx, by, bz):
        cx = ay * bz - az * by
        cy = az * bx - ax * bz
        cz = ax * by - ay * bx
        return cx * ax + cy * ay + cz * az
    f = jax.jit(cross_dot_soa)
    c, t = timed(f, ax, ay, az, bx, by, bz)
    emit(step="crossdot_soa", compile_s=c, time_s=t)

    # --- H1b: gathers ------------------------------------------------------
    idx = jax.random.randint(key, (N,), 0, 100000, jnp.int32)
    table3 = jax.random.normal(key, (100000, 3), jnp.float32)
    tablex = table3[:, 0]

    f = jax.jit(lambda tb, i: jnp.take(tb, i, axis=0))
    c, t = timed(f, table3, idx)
    emit(step="gather_table_N3", compile_s=c, time_s=t)

    f = jax.jit(lambda tb, i: jnp.take(tb, i))
    c, t = timed(f, tablex, idx)
    emit(step="gather_table_N1", compile_s=c, time_s=t)

    f = jax.jit(lambda tb, i: jnp.take(tb, i, axis=0))
    wide = jax.random.normal(key, (100000, 16), jnp.float32)
    c, t = timed(f, wide, idx)
    emit(step="gather_table_N16", compile_s=c, time_s=t)

    # one-hot matmul alternative for small tables (S=16 here): [N,16]@[16,3]
    small = jax.random.normal(key, (16, 3), jnp.float32)
    sidx = idx % 16

    def onehot_gather(tb, i):
        oh = jax.nn.one_hot(i, 16, dtype=jnp.float32)
        return oh @ tb
    f = jax.jit(onehot_gather)
    c, t = timed(f, small, sidx)
    emit(step="gather16_onehot_mm", compile_s=c, time_s=t)

    # --- H2: pallas pipeline constant-block refetch ------------------------
    nodes = jnp.zeros((20803, 16), jnp.float32)
    tris = jnp.zeros((10402, 128), jnp.float32)
    x1 = jnp.ones((N,), jnp.float32)

    def dead_kernel(x_ref, nodes_ref, tris_ref, o_ref):
        o_ref[:] = x_ref[:] + nodes_ref[0, 0] + tris_ref[0, 0]

    def dead_kernel_nob(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    for tile in (1024, 8192, 65536):
        npad = (-N) % tile
        x = jnp.concatenate([x1, jnp.zeros((npad,), jnp.float32)])
        total = x.shape[0]
        grid = (total // tile,)
        tspec = pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
        rep = lambda *shape: pl.BlockSpec(
            shape, (lambda i: tuple(0 for _ in shape)),
            memory_space=pltpu.VMEM)

        f = jax.jit(lambda x: pl.pallas_call(
            dead_kernel, grid=grid,
            in_specs=[tspec, rep(*nodes.shape), rep(*tris.shape)],
            out_specs=tspec,
            out_shape=jax.ShapeDtypeStruct((total,), jnp.float32),
        )(x, nodes, tris))
        c, t = timed(f, x)
        emit(step=f"pallas_repblocks_tile{tile}", compile_s=c, time_s=t,
             grid=grid[0])

        f = jax.jit(lambda x: pl.pallas_call(
            dead_kernel_nob, grid=grid,
            in_specs=[tspec], out_specs=tspec,
            out_shape=jax.ShapeDtypeStruct((total,), jnp.float32),
        )(x))
        c, t = timed(f, x)
        emit(step=f"pallas_noblocks_tile{tile}", compile_s=c, time_s=t,
             grid=grid[0])

    # H2b: arbitrary dimension semantics at tile 1024
    tile = 1024
    npad = (-N) % tile
    x = jnp.concatenate([x1, jnp.zeros((npad,), jnp.float32)])
    total = x.shape[0]
    grid = (total // tile,)
    tspec = pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
    rep = lambda *shape: pl.BlockSpec(
        shape, (lambda i: tuple(0 for _ in shape)),
        memory_space=pltpu.VMEM)
    try:
        f = jax.jit(lambda x: pl.pallas_call(
            dead_kernel, grid=grid,
            in_specs=[tspec, rep(*nodes.shape), rep(*tris.shape)],
            out_specs=tspec,
            out_shape=jax.ShapeDtypeStruct((total,), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x))
        c, t = timed(f, x)
        emit(step="pallas_repblocks_tile1024_arbitrary", compile_s=c,
             time_s=t)
    except Exception as e:
        emit(step="pallas_repblocks_tile1024_arbitrary", error=str(e)[:200])

    emit(step="done")


if __name__ == "__main__":
    main()
