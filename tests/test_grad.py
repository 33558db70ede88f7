"""Gradient validation: autodiff vs central finite differences.

The 'grad allclose pass rate' metric: every differentiable parameter class
(sphere center/radius, triangle vertices, material albedo/specular, light
intensity/position) is checked at interior configurations (no visibility
silhouette under the probe pixel set), where hard-visibility rendering is
smooth and FD must agree with autodiff.

FD in float32 is noisy; central differences with well-chosen steps and
a scale-aware tolerance keep this deterministic.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unity_raytracer_tpu.models.presets import three_spheres, cornell_box
from unity_raytracer_tpu.ops.render import render, resolve_mode
from unity_raytracer_tpu.models.camera import generate_rays
from unity_raytracer_tpu.ops.render import trace_radiance


def _loss_fn(scene, cam, cfg):
    """Mean radiance over a small probe image — smooth in interior regions."""
    img = render(scene, cam, cfg)
    return jnp.mean(img)


def _fd_check(update_scene, scene, cam, cfg, x0, eps, rtol=0.08, atol=1e-5,
              min_grad=1e-7):
    """Compare d(loss)/dx via autodiff and central FD for scalar slices of x.

    update_scene(scene, x) -> scene with parameter array x installed.
    """
    cfg = resolve_mode(scene, cfg)

    def f(x):
        return _loss_fn(update_scene(scene, x), cam, cfg)

    g = jax.grad(f)(x0)
    g = np.asarray(g)
    x0np = np.asarray(x0)

    flat = x0np.reshape(-1)
    gflat = g.reshape(-1)
    n_checked = 0
    for i in range(flat.shape[0]):
        delta = np.zeros_like(flat)
        delta[i] = eps
        xp = jnp.asarray((flat + delta).reshape(x0np.shape))
        xm = jnp.asarray((flat - delta).reshape(x0np.shape))
        fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
        ad = float(gflat[i])
        if abs(fd) < min_grad and abs(ad) < min_grad:
            continue
        n_checked += 1
        assert np.isclose(ad, fd, rtol=rtol, atol=atol), (
            f"param slice {i}: autodiff {ad} vs FD {fd}")
    assert n_checked > 0, "all gradients were ~zero — test probes nothing"
    return g


@pytest.fixture(scope="module")
def small_scene():
    # small probe renders keep FD affordable; no mirror bounce to avoid
    # reflected silhouettes crossing pixel centers under perturbation
    scene, cam, cfg = three_spheres(width=16, height=16)
    return scene, cam, cfg.with_(max_bounces=0)


class TestGradients:
    def test_sphere_center(self, small_scene):
        scene, cam, cfg = small_scene

        def upd(s, x):
            return dataclasses.replace(
                s, spheres=dataclasses.replace(s.spheres, centers=x))

        _fd_check(upd, scene, cam, cfg, scene.spheres.centers, eps=3e-3)

    def test_sphere_radius(self, small_scene):
        scene, cam, cfg = small_scene

        def upd(s, x):
            return dataclasses.replace(
                s, spheres=dataclasses.replace(s.spheres, radius_sq=x))

        _fd_check(upd, scene, cam, cfg, scene.spheres.radius_sq, eps=3e-3)

    def test_triangle_verts(self, small_scene):
        scene, cam, cfg = small_scene

        def upd(s, x):
            return dataclasses.replace(
                s, triangles=dataclasses.replace(s.triangles, verts=x))

        # note: shading normals stay fixed; gradient flows through hit
        # geometry (t, point) only — vertex FD must still match
        _fd_check(upd, scene, cam, cfg, scene.triangles.verts, eps=5e-3)

    def test_material_diffuse(self, small_scene):
        scene, cam, cfg = small_scene

        def upd(s, x):
            m = dataclasses.replace(s.spheres.materials, diffuse=x)
            return dataclasses.replace(
                s, spheres=dataclasses.replace(s.spheres, materials=m))

        _fd_check(upd, scene, cam, cfg, scene.spheres.materials.diffuse,
                  eps=1e-2)

    def test_material_specular(self):
        # dedicated probe: big sphere, off-axis light => highlight guaranteed
        # on-screen (at 16x16 the main fixture's highlights miss every pixel)
        from unity_raytracer_tpu.models.scene import (
            SceneBuilder, make_material)
        from unity_raytracer_tpu.models.camera import Camera
        from unity_raytracer_tpu.utils.config import RenderConfig

        b = SceneBuilder()
        b.add_sphere((0, 0, 10), 3.0, make_material(
            diffuse=(0.2, 0.2, 0.2), ambient=(0.1, 0.1, 0.1),
            specular=(0.9, 0.9, 0.9), phong=30.0))
        b.add_point_light((3, 4, 0), 20000.0)
        b.set_ambient((10, 10, 10))
        scene = b.build()
        cam = Camera.make(position=(0, 0, 0), forward=(0, 0, 1), dist=1.0,
                          half_h=0.5, half_v=0.5, width=16, height=16)
        cfg = resolve_mode(scene, RenderConfig(max_bounces=0))

        def upd(s, x):
            m = dataclasses.replace(s.spheres.materials, specular=x)
            return dataclasses.replace(
                s, spheres=dataclasses.replace(s.spheres, materials=m))

        _fd_check(upd, scene, cam, cfg, scene.spheres.materials.specular,
                  eps=1e-2)

    def test_light_intensity(self, small_scene):
        scene, cam, cfg = small_scene

        def upd(s, x):
            li = dataclasses.replace(s.lights, intensities=x)
            return dataclasses.replace(s, lights=li)

        _fd_check(upd, scene, cam, cfg, scene.lights.intensities, eps=10.0)

    def test_light_position(self, small_scene):
        scene, cam, cfg = small_scene

        def upd(s, x):
            li = dataclasses.replace(s.lights, positions=x)
            return dataclasses.replace(s, lights=li)

        _fd_check(upd, scene, cam, cfg, scene.lights.positions, eps=5e-3)

    def test_mirror_chain_grad(self, small_scene):
        """Gradient through the mirror bounce (throughput product)."""
        scene, cam, _ = small_scene
        cfg = three_spheres(width=16, height=16)[2]  # max_bounces=1

        def upd(s, x):
            m = dataclasses.replace(s.spheres.materials, mirror=x)
            return dataclasses.replace(
                s, spheres=dataclasses.replace(s.spheres, materials=m))

        _fd_check(upd, scene, cam, resolve_mode(scene, cfg),
                  scene.spheres.materials.mirror, eps=1e-2)


def test_soft_shadow_gradient_nonzero_at_silhouette():
    """With soft shadows, a light whose visibility boundary cuts the probe
    rays gets a nonzero gradient w.r.t. the occluder position; with hard
    shadows + straight-through, forward values stay exactly hard."""
    scene, cam, cfg = three_spheres(width=24, height=24)
    cfg = resolve_mode(scene, cfg.with_(max_bounces=0))
    soft = cfg.with_(diff=cfg.diff.__class__(
        soft_shadow_temp=0.5, straight_through=True))

    hard_img = render(scene, cam, cfg)
    st_img = render(scene, cam, soft)
    np.testing.assert_allclose(np.asarray(hard_img), np.asarray(st_img),
                               rtol=1e-6, atol=1e-6)

    def f(centers, c):
        s = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, centers=centers))
        return jnp.mean(render(s, cam, c))

    g_soft = np.asarray(jax.grad(f)(scene.spheres.centers, soft))
    assert np.abs(g_soft).max() > 0.0
    assert np.isfinite(g_soft).all()


def test_refraction_gradients_finite():
    """The dielectric tree must produce finite gradients (no NaN from TIR
    masking or guarded normalizations)."""
    scene, cam, cfg = cornell_box(width=12, height=12)
    cfg = resolve_mode(scene, cfg.with_(max_bounces=2))

    def f(ior):
        m = dataclasses.replace(scene.spheres.materials, ior=ior)
        s = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, materials=m))
        return jnp.mean(render(s, cam, cfg))

    g = np.asarray(jax.grad(f)(scene.spheres.materials.ior))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
