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
