"""Fused segment megakernel (ops/pallas/mega.py) vs the composed path.

The megakernel re-orders shading arithmetic (scalar SoA vs [N,L] tensor
sums), so parity is allclose, not bitwise. Runs the Pallas interpreter on
CPU; the same kernel compiles natively on TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unity_raytracer_tpu.models import meshgen
from unity_raytracer_tpu.models.camera import Camera
from unity_raytracer_tpu.models.scene import SceneBuilder, make_material
from unity_raytracer_tpu.ops import bvh as bvhmod
from unity_raytracer_tpu.ops.render import render, resolve_mode
from unity_raytracer_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def small_scene():
    """Mirror sphere + two-mesh icosphere + ground + 2 lights: exercises
    every megakernel feature (BVH mesh, sphere, loose tris, multi-light
    shadows, mirror bounce, background misses)."""
    b = SceneBuilder()
    v, f = meshgen.icosphere(subdivisions=2, radius=2.0, center=(0, 2, 8))
    b.add_mesh(v, f, make_material(diffuse=(0.7, 0.5, 0.2),
                                   ambient=(0.7, 0.5, 0.2),
                                   specular=(0.6, 0.6, 0.6), phong=40.0))
    b.add_sphere((-3, 1.5, 6), 1.5, make_material(
        diffuse=(0.1, 0.1, 0.1), ambient=(0.1, 0.1, 0.1),
        specular=(1, 1, 1), phong=200.0, mirror=(0.9, 0.9, 0.9),
        is_mirror=True))
    g = 30.0
    gmat = make_material(diffuse=(0.5, 0.5, 0.55),
                         ambient=(0.5, 0.5, 0.55), phong=1.0)
    b.add_triangle((-g, 0, -g), (g, 0, -g), (g, 0, g), gmat)
    b.add_triangle((-g, 0, -g), (g, 0, g), (-g, 0, g), gmat)
    b.add_point_light((5, 8, 0), 800.0)
    b.add_point_light((-6, 7, 10), 500.0)
    b.set_ambient((8, 8, 8))
    scene = b.build()
    cam = Camera.make(position=(0, 3, -4), forward=(0, -0.15, 1),
                      dist=1.0, half_h=0.8, half_v=0.8,
                      width=32, height=32)
    return scene, cam


def test_mega_matches_composed(small_scene):
    scene, cam = small_scene
    cfg = RenderConfig(max_bounces=2, background=(0.04, 0.05, 0.07),
                       use_bvh=True, mode="scan", block_size=32)
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    assert packed.leafmeta is not None

    img_ref = np.asarray(render(scene, cam, cfg.with_(kernel="xla"),
                                bvh=packed))
    img_mega = np.asarray(render(scene, cam, cfg.with_(kernel="mega"),
                                 bvh=packed))
    assert np.isfinite(img_mega).all()
    np.testing.assert_allclose(img_mega, img_ref, rtol=2e-4, atol=2e-4)
    # the scene must actually exercise hits, shadows and mirror bounces
    assert img_ref.std() > 0.01


def test_mega_walk_unroll_parity(small_scene):
    """walk_unroll composes the -1-safe wide body; the image must be
    IDENTICAL (same tests in the same order, only loop bookkeeping
    amortized)."""
    scene, cam = small_scene
    cfg = RenderConfig(max_bounces=2, background=(0.04, 0.05, 0.07),
                       use_bvh=True, mode="scan", block_size=32)
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    img1 = np.asarray(render(scene, cam, cfg.with_(kernel="mega"),
                             bvh=packed))
    img2 = np.asarray(render(scene, cam,
                             cfg.with_(kernel="mega", walk_unroll=2),
                             bvh=packed))
    np.testing.assert_array_equal(img1, img2)


def test_mega_leaf28_parity(small_scene):
    """bvh_leaf=28: leaves span TWO consecutive 128-lane rows (wider
    rows crash Mosaic's native compile — static lanes must stay inside
    the first register); images must match the xla reference on every
    kernel."""
    scene, cam = small_scene
    cfg = RenderConfig(max_bounces=2, background=(0.04, 0.05, 0.07),
                       use_bvh=True, mode="scan", block_size=32,
                       bvh_leaf=28)
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    assert packed.rows_per_leaf == 2
    assert packed.tris.shape[1] == 128
    img_ref = np.asarray(render(scene, cam, cfg.with_(kernel="xla"),
                                bvh=packed))
    img_mega = np.asarray(render(scene, cam, cfg.with_(kernel="mega"),
                                 bvh=packed))
    np.testing.assert_allclose(img_mega, img_ref, rtol=2e-4, atol=2e-4)
    for kern in ("wide", "pallas", "pallas3"):
        img_k = np.asarray(render(scene, cam, cfg.with_(kernel=kern),
                                  bvh=packed))
        np.testing.assert_allclose(img_k, img_ref, rtol=2e-4, atol=2e-4,
                                   err_msg=kern)


def test_mega_occ_mode_parity(small_scene):
    """The occlusion-walk push discipline ('sort'/'keys'/'none') changes
    visit order and pruning, never results — images must be identical."""
    scene, cam = small_scene
    cfg = RenderConfig(max_bounces=2, background=(0.04, 0.05, 0.07),
                       use_bvh=True, mode="scan", block_size=32)
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    img_p = np.asarray(render(scene, cam, cfg.with_(kernel="mega"),
                              bvh=packed))
    for m in ("keys", "none"):
        img_i = np.asarray(render(scene, cam,
                                  cfg.with_(kernel="mega", occ_mode=m),
                                  bvh=packed))
        np.testing.assert_array_equal(img_i, img_p)


def test_mega_depth0_background(small_scene):
    """Depth 0 still shades locally; rays missing everything get the
    background (Rgb scale division checked end to end)."""
    scene, cam = small_scene
    cfg = RenderConfig(max_bounces=0, background=(0.2, 0.0, 0.1),
                       use_bvh=True, mode="scan", block_size=32)
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    img_ref = np.asarray(render(scene, cam, cfg.with_(kernel="xla"),
                                bvh=packed))
    img_mega = np.asarray(render(scene, cam, cfg.with_(kernel="mega"),
                                 bvh=packed))
    np.testing.assert_allclose(img_mega, img_ref, rtol=2e-4, atol=2e-4)


def test_mega_shipped_flagship_knobs(small_scene):
    """Depth-2 mirror-chain parity on the shipped flagship knob set
    (models/presets.py mesh_scene defaults): per-light shadow walks
    (fuse_shadows=False), multi-row leaves, walk_unroll=2,
    occ_mode='sort'. CI fails if the shipped configuration regresses
    (VERDICT r3 next-step #6). tile_r is scaled to the test frame and
    bvh_leaf to 56 (4 rows): the shipped 98-tri 7-row leaves run the
    IDENTICAL code path with a bigger static unroll, which the Pallas
    interpreter cannot execute in CI time (>10 min; measured)."""
    scene, cam = small_scene
    cfg = RenderConfig(max_bounces=2, background=(0.04, 0.05, 0.07),
                       use_bvh=True, mode="scan", block_size=16,
                       tile_r=256, bvh_leaf=56, walk_unroll=2,
                       fuse_shadows=False, occ_mode="sort")
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    assert packed.rows_per_leaf == 4
    img_ref = np.asarray(render(scene, cam, cfg.with_(kernel="xla"),
                                bvh=packed))
    img_mega = np.asarray(render(scene, cam, cfg.with_(kernel="mega"),
                                 bvh=packed))
    assert np.isfinite(img_mega).all()
    np.testing.assert_allclose(img_mega, img_ref, rtol=2e-4, atol=2e-4)
    assert img_ref.std() > 0.01


def test_mega_light_cull_bounded_and_parity(small_scene):
    """cfg.light_cull drops lights whose conservative contribution bound
    (max(kd)+max(ks))*max(I)/d^2 is under the threshold. The error must
    stay within the documented bound (threshold per light per segment,
    /255 on the display scale) and the megakernel must apply the SAME
    gate as the composed path."""
    scene, cam = small_scene
    tau = 2.0
    cfg = RenderConfig(max_bounces=2, background=(0.04, 0.05, 0.07),
                       use_bvh=True, mode="scan", block_size=32)
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    img_exact = np.asarray(render(scene, cam, cfg.with_(kernel="xla"),
                                  bvh=packed))
    img_cx = np.asarray(render(scene, cam,
                               cfg.with_(kernel="xla", light_cull=tau),
                               bvh=packed))
    img_cm = np.asarray(render(scene, cam,
                               cfg.with_(kernel="mega", light_cull=tau),
                               bvh=packed))
    # the cull must actually fire on this scene at this threshold
    diff = np.abs(img_cx - img_exact).max()
    assert diff > 0.0, "light_cull never fired; test proves nothing"
    n_lights = 2
    bound = (cfg.max_bounces + 1) * n_lights * tau / 255.0
    assert diff <= bound + 1e-6
    # mega applies the same gate (boundary lanes may flip on fp noise;
    # each flip is bounded by tau/255 on the display scale)
    np.testing.assert_allclose(img_cm, img_cx, rtol=2e-4, atol=0.01)


def test_mega_bw_isect_parity(small_scene):
    """tri_isect='bw' (Baldwin–Weber precomputed leaf records) must
    produce the same image as the Möller–Trumbore kernel and the xla
    reference up to fp rounding — the hit set is mathematically equal;
    only the arithmetic route to (t, u, v) differs."""
    scene, cam = small_scene
    cfg = RenderConfig(max_bounces=2, background=(0.04, 0.05, 0.07),
                       use_bvh=True, mode="scan", block_size=16,
                       tile_r=256, bvh_leaf=56, walk_unroll=2,
                       fuse_shadows=False, occ_mode="sort")
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    assert packed.tris_bw is not None
    assert packed.bw_rows_per_leaf == 6  # ceil(4*14 / 10)
    img_ref = np.asarray(render(scene, cam, cfg.with_(kernel="xla"),
                                bvh=packed))
    img_bw = np.asarray(render(
        scene, cam, cfg.with_(kernel="mega", tri_isect="bw"),
        bvh=packed))
    assert np.isfinite(img_bw).all()
    np.testing.assert_allclose(img_bw, img_ref, rtol=5e-4, atol=5e-4)
    # and with the fused occlusion walk (covers _occluded_fused's bw path)
    img_bw_f = np.asarray(render(
        scene, cam, cfg.with_(kernel="mega", tri_isect="bw",
                              fuse_shadows=True),
        bvh=packed))
    np.testing.assert_allclose(img_bw_f, img_ref, rtol=5e-4, atol=5e-4)



def test_mega_shadow_batch_parity(small_scene):
    """cfg.shadow_batch advances all per-light walks in one while_loop
    with independent stacks; every light still visits exactly its own
    nodes in the same order, so the image must be IDENTICAL to the
    per-light sequential walks."""
    scene, cam = small_scene
    cfg = RenderConfig(max_bounces=2, background=(0.04, 0.05, 0.07),
                       use_bvh=True, mode="scan", block_size=32,
                       fuse_shadows=False)
    packed = bvhmod.prepare_bvh(scene, cfg.with_(kernel="mega"))
    base = np.asarray(render(scene, cam, cfg.with_(kernel="mega"),
                             bvh=packed))
    bat = np.asarray(render(
        scene, cam, cfg.with_(kernel="mega", shadow_batch=True),
        bvh=packed))
    np.testing.assert_array_equal(bat, base)
