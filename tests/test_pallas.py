"""Pallas megakernel vs jnp brute force (interpret mode on CPU).

On real TPU the same kernel compiles natively; CI exercises semantics via
the Pallas interpreter so the contract (exact nearest-hit equivalence,
first-min tie-break, padding behavior) is enforced everywhere.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unity_raytracer_tpu.models import meshgen
from unity_raytracer_tpu.ops import intersect as isect
from unity_raytracer_tpu.ops.pallas.intersect_mk import (
    nearest_triangle_pallas)


def _rays(rng, n, spread=3.0):
    o = rng.normal(size=(n, 3)).astype(np.float32) * spread
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_matches_brute_force(rng):
    v, f = meshgen.icosphere(subdivisions=3, radius=2.0)
    verts = jnp.asarray(v[f])
    o, d = _rays(rng, 700)  # deliberately not a TILE_R multiple
    t_ref = isect.ray_triangles(o, d, verts)
    i_ref = np.asarray(jnp.argmin(t_ref, axis=1))
    tmin = np.asarray(jnp.min(t_ref, axis=1))
    t_p, i_p = nearest_triangle_pallas(o, d, verts, interpret=True)
    t_p, i_p = np.asarray(t_p), np.asarray(i_p)
    hit = np.isfinite(tmin)
    assert hit.any()
    np.testing.assert_array_equal(i_p[hit], i_ref[hit])
    np.testing.assert_allclose(t_p[hit], tmin[hit], rtol=1e-5, atol=1e-5)
    assert ((i_p == -1) == ~hit).all()


def test_nearest_hit_routes_brute_kernel(rng):
    """Big mesh without a BVH + explicit pallas kernel: nearest_hit must
    route through the fused brute-force kernel (interpreted on CPU) and
    agree with the XLA brute path — including the differentiable-t
    epilogue."""
    import jax
    import jax.numpy as jnp2

    from unity_raytracer_tpu.models.scene import SceneBuilder, make_material

    v, f = meshgen.icosphere(subdivisions=4, radius=2.0)  # 5120 tris
    b = SceneBuilder()
    b.add_mesh(v, f, make_material(diffuse=(1, 0, 0)))
    b.add_point_light((0, 5, 0), 100.0)
    scene = b.build()
    assert scene.meshes.count >= 2048

    o, d = _rays(rng, 200, spread=4.0)
    from unity_raytracer_tpu.ops.intersect import nearest_hit
    ref = nearest_hit(scene, o, d, kernel="xla")
    got = nearest_hit(scene, o, d, kernel="pallas")
    np.testing.assert_array_equal(np.asarray(got.kind),
                                  np.asarray(ref.kind))
    hit = np.asarray(ref.kind) != 0
    np.testing.assert_array_equal(np.asarray(got.index)[hit],
                                  np.asarray(ref.index)[hit])
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(ref.t)[hit], rtol=1e-6)

    # gradient flows through the re-derived t
    def f_t(verts):
        import dataclasses
        s2 = dataclasses.replace(
            scene, meshes=dataclasses.replace(scene.meshes, verts=verts))
        h = nearest_hit(s2, o, d, kernel="pallas")
        return jnp2.sum(jnp2.where(jnp2.isfinite(h.t), h.t, 0.0))

    g = jax.grad(f_t)(scene.meshes.verts)
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).max()) > 0


def test_valid_mask(rng):
    v, f = meshgen.icosphere(subdivisions=2, radius=2.0)
    tris = v[f]
    m = tris.shape[0]
    # invalidate half the sphere: those hits must vanish
    valid = np.arange(m) < m // 2
    o, d = _rays(rng, 256)
    t_ref = isect.ray_triangles(o, d, jnp.asarray(tris),
                                jnp.asarray(valid))
    tmin = np.asarray(jnp.min(t_ref, axis=1))
    i_ref = np.asarray(jnp.argmin(t_ref, axis=1))
    t_p, i_p = nearest_triangle_pallas(o, d, jnp.asarray(tris),
                                       jnp.asarray(valid), interpret=True)
    hit = np.isfinite(tmin)
    np.testing.assert_array_equal(np.asarray(i_p)[hit], i_ref[hit])
    np.testing.assert_allclose(np.asarray(t_p)[hit], tmin[hit], rtol=1e-5)
