"""Interpreter-mode CI for the packed-row packet traversal kernels.

The flagship TPU kernels (ops/pallas/traverse_mk3 threaded order,
traverse_mk4 ordered near-child-first descent — the default on TPU via
ops/bvh.traverse_any) must agree with the XLA reference traversal
``bvh.traverse`` (itself brute-force-verified in test_bvh.py) on every
contract surface: nearest hit id/t, ``any_hit`` occlusion, ``t_max``
seeding, negative-``t_max`` lane culls, pad lanes (N not a TILE_R
multiple), and full leaves at the PALLAS_LEAF boundary.

All runs use ``interpret=True`` (Pallas interpreter on CPU) — the same
kernel code compiles natively on TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unity_raytracer_tpu.models import meshgen
from unity_raytracer_tpu.ops import bvh as bvhmod
from unity_raytracer_tpu.ops.pallas.traverse_mk3 import (
    PALLAS_LEAF, pack_rows, traverse_packet3)
from unity_raytracer_tpu.ops.pallas.traverse_mk4 import traverse_packet4
from unity_raytracer_tpu.ops.pallas.traverse_wide import (
    traverse_wide, widen)

KERNELS = {"mk3": traverse_packet3, "mk4": traverse_packet4,
           "wide": traverse_wide}


def _rand_rays(rng, n, spread=3.0):
    o = rng.normal(size=(n, 3)).astype(np.float32) * spread
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _packed(tris, valid=None, arity=4):
    b = bvhmod.build(np.asarray(tris), valid, leaf_size=PALLAS_LEAF)
    return widen(pack_rows(b), arity=arity)


@pytest.fixture(scope="module")
def icosphere_packed():
    v, f = meshgen.icosphere(subdivisions=3, radius=2.0)
    return jnp.asarray(v[f]), _packed(v[f])


@pytest.mark.parametrize("name", ["mk3", "mk4", "wide"])
def test_nearest_matches_xla_traverse(rng, icosphere_packed, name):
    """Nearest hit (t, id) must equal the XLA traversal — 700 rays is
    deliberately not a TILE_R multiple, exercising pad lanes."""
    verts, packed = icosphere_packed
    o, d = _rand_rays(rng, 700)
    t_ref, i_ref, _ = bvhmod.traverse(packed.bvh, o, d)
    t_p, i_p, _ = KERNELS[name](packed, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_ref))
    hit = np.isfinite(np.asarray(t_ref))
    assert hit.mean() > 0.05
    np.testing.assert_allclose(np.asarray(t_p)[hit],
                               np.asarray(t_ref)[hit], rtol=1e-6)
    assert not np.isfinite(np.asarray(t_p)[~hit]).any()


@pytest.mark.parametrize("name", ["mk3", "mk4", "wide"])
def test_random_soup_full_leaves(rng, name):
    """Random soup with enough triangles that some leaves are FULL
    (count == PALLAS_LEAF), covering the static leaf-unroll boundary."""
    m = 420
    tris = (rng.normal(size=(m, 1, 3)) * 4
            + rng.normal(size=(m, 3, 3)) * 0.7).astype(np.float32)
    packed = _packed(tris)
    counts = np.asarray(packed.bvh.count)
    assert counts.max() == PALLAS_LEAF, "fixture must produce a full leaf"
    o, d = _rand_rays(rng, 512, spread=5.0)
    t_ref, i_ref, _ = bvhmod.traverse(packed.bvh, o, d)
    t_p, i_p, _ = KERNELS[name](packed, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_ref))
    hit = np.isfinite(np.asarray(t_ref))
    np.testing.assert_allclose(np.asarray(t_p)[hit],
                               np.asarray(t_ref)[hit], rtol=1e-6)


@pytest.mark.parametrize("name", ["mk3", "mk4", "wide"])
def test_tmax_seed_and_negative_cull(rng, icosphere_packed, name):
    """t_max semantics: hits at/beyond t_max are misses; negative t_max
    culls the lane outright (bounce chains pass -1 for retired rays)."""
    _, packed = icosphere_packed
    n = 256
    o, d = _rand_rays(rng, n)
    t_ref, i_ref, _ = bvhmod.traverse(packed.bvh, o, d)
    t_ref = np.asarray(t_ref)
    hit = np.isfinite(t_ref)

    # seed half the hit lanes below their own hit distance -> miss;
    # cull every 3rd lane outright
    tm = np.full((n,), 1e30, np.float32)
    below = hit & (np.arange(n) % 2 == 0)
    tm[below] = np.where(np.isfinite(t_ref[below]),
                         t_ref[below] * 0.5, 1.0)
    culled = np.arange(n) % 3 == 0
    tm[culled] = -1.0

    t_p, i_p, _ = KERNELS[name](packed, o, d, t_max=jnp.asarray(tm),
                                interpret=True)
    t_p, i_p = np.asarray(t_p), np.asarray(i_p)
    assert (i_p[culled] == -1).all()
    assert (i_p[below & ~culled] == -1).all()
    keep = hit & ~below & ~culled
    np.testing.assert_array_equal(i_p[keep], np.asarray(i_ref)[keep])
    np.testing.assert_allclose(t_p[keep], t_ref[keep], rtol=1e-6)


@pytest.mark.parametrize("name", ["mk3", "mk4", "wide"])
def test_any_hit_occlusion(rng, icosphere_packed, name):
    """any_hit mode: the occlusion predicate (some hit with t < t_max)
    must match the nearest-hit derivation, lane for lane."""
    _, packed = icosphere_packed
    n = 512
    o, d = _rand_rays(rng, n)
    t_ref, _, _ = bvhmod.traverse(packed.bvh, o, d)
    t_ref = np.asarray(t_ref)
    tm = np.full((n,), 4.0, np.float32)
    occluded_ref = np.isfinite(t_ref) & (t_ref < tm)

    t_p, _, _ = KERNELS[name](packed, o, d, t_max=jnp.asarray(tm),
                              any_hit=True, interpret=True)
    t_p = np.asarray(t_p)
    occluded_p = np.isfinite(t_p) & (t_p < tm)
    np.testing.assert_array_equal(occluded_p, occluded_ref)
    # reported occluder distances must be genuine hits below t_max
    v = occluded_p
    assert (t_p[v] > 0).all() and (t_p[v] < tm[v]).all()


@pytest.mark.parametrize("name", ["mk3", "mk4", "wide"])
def test_all_dead_tile(rng, icosphere_packed, name):
    """A tile whose lanes are ALL culled must exit at the root and
    report misses (the bounce chain's dead-segment fast path)."""
    _, packed = icosphere_packed
    n = 128
    o, d = _rand_rays(rng, n)
    tm = jnp.full((n,), -1.0, jnp.float32)
    t_p, i_p, _ = KERNELS[name](packed, o, d, t_max=tm, interpret=True)
    assert (np.asarray(i_p) == -1).all()
    assert not np.isfinite(np.asarray(t_p)).any()


def test_wide_arity8(rng, icosphere_packed):
    """The collapse arity is a config knob (RenderConfig.bvh_arity) — the
    8-wide tree must be traversal-identical to the binary reference."""
    _, packed4 = icosphere_packed
    packed8 = widen(packed4, arity=8)
    assert packed8.wide.shape[1] == 64
    o, d = _rand_rays(rng, 700)
    t_ref, i_ref, _ = bvhmod.traverse(packed8.bvh, o, d)
    t_w, i_w, _ = traverse_wide(packed8, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_w), np.asarray(i_ref))
    hit = np.isfinite(np.asarray(t_ref))
    np.testing.assert_allclose(np.asarray(t_w)[hit],
                               np.asarray(t_ref)[hit], rtol=1e-6)


def test_mk3_mk4_bitwise_agree(rng, icosphere_packed):
    """The two kernels walk different node orders but must produce the
    same winner (no duplicate-t geometry here)."""
    _, packed = icosphere_packed
    o, d = _rand_rays(rng, 700)
    t3, i3, _ = traverse_packet3(packed, o, d, interpret=True)
    t4, i4, _ = traverse_packet4(packed, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))
    np.testing.assert_array_equal(np.asarray(t3), np.asarray(t4))
