"""BVH equivalence: traversal must agree with brute force exactly.

The reference could never run this test — its BVH was unfinished
(Data/Collision/BVH.cs:79) and had no traversal. Here the contract is:
for any ray set and any mesh, the threaded-BVH nearest hit equals the
brute-force nearest hit in (t, primitive id) (scenes without duplicate
triangles, so ties don't arise).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unity_raytracer_tpu.models import meshgen
from unity_raytracer_tpu.ops import bvh as bvhmod
from unity_raytracer_tpu.ops import intersect as isect


def _rand_rays(rng, n, spread=3.0):
    o = rng.normal(size=(n, 3)).astype(np.float32) * spread
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _brute(verts, o, d):
    t = isect.ray_triangles(o, d, verts)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    tmin = jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]
    return np.asarray(tmin), np.where(np.isfinite(np.asarray(tmin)),
                                      np.asarray(idx), -1)


@pytest.mark.parametrize("subdiv", [1, 3])
def test_icosphere_equivalence(rng, subdiv):
    v, f = meshgen.icosphere(subdivisions=subdiv, radius=2.0, center=(0, 0, 0))
    verts = jnp.asarray(v[f])
    bvh = bvhmod.build(np.asarray(verts))
    o, d = _rand_rays(rng, 512)
    t_ref, i_ref = _brute(verts, o, d)
    t_bvh, i_bvh, _ = bvhmod.traverse(bvh, o, d)
    t_bvh, i_bvh = np.asarray(t_bvh), np.asarray(i_bvh)
    np.testing.assert_array_equal(i_bvh, i_ref)
    hit = np.isfinite(t_ref)
    np.testing.assert_allclose(t_bvh[hit], t_ref[hit], rtol=1e-6, atol=1e-6)
    assert hit.mean() > 0.05  # rays actually hit something


def test_random_soup_equivalence(rng):
    m = 500
    tris = (rng.normal(size=(m, 1, 3)) * 4
            + rng.normal(size=(m, 3, 3)) * 0.7).astype(np.float32)
    verts = jnp.asarray(tris)
    bvh = bvhmod.build(tris)
    o, d = _rand_rays(rng, 512, spread=5.0)
    t_ref, i_ref = _brute(verts, o, d)
    t_bvh, i_bvh, _ = bvhmod.traverse(bvh, o, d)
    np.testing.assert_array_equal(np.asarray(i_bvh), i_ref)
    hit = np.isfinite(t_ref)
    np.testing.assert_allclose(np.asarray(t_bvh)[hit], t_ref[hit],
                               rtol=1e-6, atol=1e-6)


def test_valid_mask_respected(rng):
    v, f = meshgen.icosphere(subdivisions=2, radius=2.0)
    tris = v[f]
    m = tris.shape[0]
    valid = np.ones(m + 7, bool)
    valid[m:] = False
    padded = np.concatenate(
        [tris, np.zeros((7, 3, 3), np.float32)], axis=0)
    bvh = bvhmod.build(padded, valid)
    o, d = _rand_rays(rng, 256)
    t_ref, i_ref = _brute(jnp.asarray(tris), o, d)
    t_bvh, i_bvh, _ = bvhmod.traverse(bvh, o, d)
    np.testing.assert_array_equal(np.asarray(i_bvh), i_ref)


def test_tmax_seed_prunes(rng):
    """Seeding t_max below every hit distance reports only nearer hits."""
    v, f = meshgen.icosphere(subdivisions=2, radius=1.0, center=(0, 0, 10))
    bvh = bvhmod.build(v[f])
    n = 64
    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    t_near, i_near, _ = bvhmod.traverse(bvh, o, d)
    assert np.isfinite(np.asarray(t_near)).all()
    t_cut, i_cut, _ = bvhmod.traverse(bvh, o, d,
                                   t_max=jnp.full((n,), 5.0, jnp.float32))
    assert (np.asarray(i_cut) == -1).all()


def test_traverse_gradient_flows(rng):
    """t of the winning triangle must be differentiable w.r.t. vertices."""
    v, f = meshgen.icosphere(subdivisions=1, radius=2.0)
    tris = v[f]
    o = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)

    bvh = bvhmod.build(tris)

    def f_scale(scale):
        scaled = bvh.tri_verts * scale
        b2 = type(bvh)(node_min=bvh.node_min, node_max=bvh.node_max,
                       first=bvh.first, count=bvh.count,
                       miss_next=bvh.miss_next, tri_verts=scaled,
                       prim_index=bvh.prim_index)
        t, _, _ = bvhmod.traverse(b2, o, d)
        return t[0]

    g = float(jax.grad(f_scale)(jnp.float32(1.0)))
    # sphere radius 2, origin at -5: t = 5 - 2*scale => dt/dscale ~ -2
    assert np.isfinite(g)
    assert -2.5 < g < -1.5, g


def test_leaf_sizes_respected():
    v, f = meshgen.icosphere(subdivisions=3, radius=1.0)
    bvh = bvhmod.build(v[f])
    counts = np.asarray(bvh.count)
    assert counts.max() <= bvhmod.LEAF_SIZE
    leaf_total = counts.sum()
    assert leaf_total == len(f)  # every triangle in exactly one leaf


def test_native_builder_matches_numpy(rng):
    """The C++ builder and the numpy reference builder must be
    traversal-identical (same layout contract)."""
    pytest.importorskip("ctypes")
    from unity_raytracer_tpu.ops.bvh import _native_lib
    if _native_lib() is None:
        pytest.skip("native builder unavailable (no g++?)")
    v, f = meshgen.icosphere(subdivisions=3, radius=2.0)
    tris = v[f]
    b_np = bvhmod.build(tris, backend="numpy")
    b_cc = bvhmod.build(tris, backend="native")
    o, d = _rand_rays(rng, 512)
    t1, i1, _ = bvhmod.traverse(b_np, o, d)
    t2, i2, _ = bvhmod.traverse(b_cc, o, d)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    hit = np.isfinite(np.asarray(t1))
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)


def test_presplit_equivalence(rng):
    """SBVH-style spatial presplitting (build(presplit=...)) duplicates
    refs with clipped boxes but must keep the hit set EXACT: every ray's
    nearest (t, prim) matches brute force, including on a random soup
    with wildly heterogeneous triangle sizes (the geometry presplitting
    exists for)."""
    m = 400
    tris = (rng.normal(size=(m, 1, 3)) * 4
            + rng.normal(size=(m, 3, 3)) * 0.7).astype(np.float32)
    # make a handful of triangles huge so splitting actually fires
    tris[:8] = (tris[:8] - tris[:8].mean(1, keepdims=True)) * 12 \
        + tris[:8].mean(1, keepdims=True)
    verts = jnp.asarray(tris)
    b = bvhmod.build(tris, presplit=1.0)
    assert b.tri_verts.shape[0] > m            # splitting actually fired
    assert int(jnp.max(b.prim_index)) < m      # refs map to originals
    o, d = _rand_rays(rng, 512, spread=5.0)
    t_ref, i_ref = _brute(verts, o, d)
    t_bvh, i_bvh, _ = bvhmod.traverse(b, o, d)
    np.testing.assert_array_equal(np.asarray(i_bvh), i_ref)
    hit = np.isfinite(t_ref)
    np.testing.assert_allclose(np.asarray(t_bvh)[hit], t_ref[hit],
                               rtol=1e-6, atol=1e-6)
