"""Mesh-vertex deformation FIT artifact (VERDICT r4 missing #3 "Done"
half 2: a small mesh-deformation fit artifact) — CPU run.

Why CPU: the artifact demonstrates the CAPABILITY (mesh_verts in
fit.PARAM_PATHS through ops/bvh.bind_verts on the composed XLA path);
there is no perf claim, and the r5f TPU attempt hung a flaky remote
tunnel mid-fit while holding the chip. Scaled-up version of the
passing tests/test_mesh_grad.py::test_mesh_verts_deformation_fit_
recovers: subdiv-3 icosphere (1280 tris), 96x96, dents sized to the
mesh's OWN edge length (amplitude-vs-triangle-size is what made the
first 10k-tri attempt wobble: a 0.3 dent on a subdiv-5 triangle is a
spike, not a dent).

Writes FIT_r05_mesh.json. Usage: python scripts/meshfit_cpu.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from unity_raytracer_tpu.fit import FitConfig, fit
    from unity_raytracer_tpu.models import meshgen
    from unity_raytracer_tpu.models.camera import Camera
    from unity_raytracer_tpu.models.scene import SceneBuilder, make_material
    from unity_raytracer_tpu.ops import bvh as bvhmod
    from unity_raytracer_tpu.ops.render import render, resolve_mode
    from unity_raytracer_tpu.utils.config import RenderConfig

    b = SceneBuilder()
    v, f = meshgen.icosphere(subdivisions=2, radius=2.0, center=(0, 2, 8))
    b.add_mesh(v, f, make_material(diffuse=(0.7, 0.5, 0.2),
                                   ambient=(0.7, 0.5, 0.2),
                                   specular=(0.4, 0.4, 0.4), phong=30.0))
    g = 30.0
    gmat = make_material(diffuse=(0.5, 0.5, 0.55),
                         ambient=(0.5, 0.5, 0.55), phong=1.0)
    b.add_triangle((-g, 0, -g), (g, 0, -g), (g, 0, g), gmat)
    b.add_triangle((-g, 0, -g), (g, 0, g), (-g, 0, g), gmat)
    b.add_point_light((5, 9, 2), 900.0)
    b.set_ambient((8, 8, 8))
    scene = b.build()
    cam = Camera.make(position=(0, 2.5, 2), forward=(0, -0.05, 1),
                      dist=1.0, half_h=0.5, half_v=0.5,
                      width=96, height=96)

    true_v = np.asarray(scene.meshes.verts)
    valid = np.asarray(scene.meshes.valid)
    edge = np.linalg.norm(true_v[:, 1] - true_v[:, 0], axis=1)
    amp = 0.6 * float(edge[valid.astype(bool)].mean())

    cfg = resolve_mode(scene, RenderConfig(
        max_bounces=1, background=(0.04, 0.05, 0.07), use_bvh=True,
        mode="scan", kernel="xla", block_size=8, ray_chunk=96 * 96 // 4,
        remat=True, bvh_pad=2.0 * amp))
    bvh = bvhmod.prepare_bvh(scene, cfg)
    target = render(scene, cam, cfg, bvh=bvh)

    cent = true_v.mean(axis=1)
    to_cam = np.asarray(cam.position) - cent
    to_cam /= np.maximum(np.linalg.norm(to_cam, axis=1, keepdims=True),
                         1e-9)
    nrm = np.asarray(scene.meshes.normals)
    facing = np.argsort(-(nrm * to_cam).sum(axis=1) * valid)[:16]
    noise = np.zeros_like(true_v)
    # tilt: move v0 along the face normal (normal rotates -> shading
    # changes smoothly); amplitude scaled to the mesh's own edge length
    noise[facing, 0, :] = amp * nrm[facing]
    init = {"mesh_verts": jnp.asarray(true_v + noise)}

    fc = FitConfig(param_names=("mesh_verts",),
                   learning_rate=0.035 * amp, steps=500,
                   soft_shadow_temp=1.0, soft_hit_temp=0.05,
                   log_every=10)
    t0 = time.perf_counter()
    res = fit(scene, cam, cfg, target, fc, init_params=init, bvh=bvh)
    dt = time.perf_counter() - t0

    def fnorm(vv):
        n = -np.cross(vv[:, 2] - vv[:, 0], vv[:, 1] - vv[:, 0])
        return n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                              1e-12)

    n_true = fnorm(true_v[facing])
    err0 = float((1 - (fnorm(np.asarray(init["mesh_verts"])[facing])
                       * n_true).sum(1)).mean())
    err1 = float((1 - (fnorm(np.asarray(
        res.params["mesh_verts"])[facing]) * n_true).sum(1)).mean())
    rec = {
        "scene": "subdiv-2 icosphere BVH (320 tris) + ground, 96x96, "
                 "depth 1: 16 camera-facing triangles TILTED (v0 moved "
                 "0.6x mean edge length along the face normal); "
                 "mesh-VERTEX recovery via fit.PARAM_PATHS 'mesh_verts' "
                 "on the composed XLA path (ops/bvh.bind_verts, "
                 "bvh_pad=2x amplitude), chunked/remat gradients, CPU "
                 "(capability artifact, no perf claim); recovery metric "
                 "= dented-face normal error (positions are ambiguous "
                 "from one view)",
        "steps": fc.steps, "wall_s": round(dt, 1),
        "dent_amplitude": amp,
        "loss_first": float(res.losses[0]),
        "loss_last": float(res.losses[-1]),
        "loss_curve": [float(x) for x in
                       res.losses[:: max(1, len(res.losses) // 20)]],
        "dented_rows": int(len(facing)),
        "normal_err_init_dented": err0,
        "normal_err_final_dented": err1,
        "n_params": int(np.prod(true_v.shape)),
    }
    with open("/root/repo/FIT_r05_mesh.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
