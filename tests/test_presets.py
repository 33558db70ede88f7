"""Scene construction sanity: windings/normals, padding masks, AABBs."""

import numpy as np

from unity_raytracer_tpu.models import meshgen
from unity_raytracer_tpu.models.presets import (
    cornell_box, mesh_scene, reference_demo, three_spheres)


def test_cornell_normals_point_inward():
    scene, _, _ = cornell_box(width=8, height=8)
    verts = np.asarray(scene.triangles.verts)
    normals = np.asarray(scene.triangles.normals)
    valid = np.asarray(scene.triangles.valid)
    box_center = np.array([0.0, 10.0, 10.0])
    for i in range(verts.shape[0]):
        if not valid[i]:
            continue
        c = verts[i].mean(axis=0)
        to_center = box_center - c
        to_center /= np.linalg.norm(to_center) + 1e-9
        assert np.dot(normals[i], to_center) > 0.1, (i, normals[i])


def test_ground_normals_up():
    scene, _, _ = three_spheres(width=8, height=8)
    normals = np.asarray(scene.triangles.normals)
    valid = np.asarray(scene.triangles.valid)
    for i in range(normals.shape[0]):
        if valid[i]:
            assert normals[i][1] > 0.99


def test_box_mesh_outward_after_flip():
    """box_mesh + the reference flip convention = outward normals."""
    v, f = meshgen.box_mesh(center=(0, 0, 0), size=(2, 2, 2))
    tris = v[f]
    n = np.cross(tris[:, 2] - tris[:, 0], tris[:, 1] - tris[:, 0])
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = -n  # SceneMesh.cs:43 convention
    centers = tris.mean(axis=1)
    for i in range(len(f)):
        assert np.dot(n[i], centers[i]) > 0.1, i


def test_icosphere_outward_after_flip():
    v, f = meshgen.icosphere(subdivisions=2, radius=3.0, center=(0, 0, 0))
    tris = v[f]
    n = np.cross(tris[:, 2] - tris[:, 0], tris[:, 1] - tris[:, 0])
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = -n
    centers = tris.mean(axis=1)
    dots = np.einsum("ij,ij->i", n, centers / np.linalg.norm(centers, axis=1,
                                                            keepdims=True))
    assert (dots > 0.5).all()


def test_mesh_scene_budgets():
    scene, _, _ = mesh_scene(10240, width=8, height=8)
    assert int(np.asarray(scene.meshes.valid).sum()) >= 10000
    scene, _, _ = mesh_scene(102400, width=8, height=8)
    assert int(np.asarray(scene.meshes.valid).sum()) >= 100000


def test_reference_demo_counts():
    scene, cam, cfg = reference_demo()
    assert int(np.asarray(scene.spheres.valid).sum()) == 1
    assert int(np.asarray(scene.triangles.valid).sum()) == 2
    assert int(np.asarray(scene.meshes.valid).sum()) == 12  # cube
    assert int(np.asarray(scene.lights.valid).sum()) == 1
    assert cfg.max_bounces == 5
    assert cam.width == 50 and cam.height == 50


def test_scene_aabb_contains_geometry():
    scene, _, _ = three_spheres(width=8, height=8)
    lo = np.asarray(scene.aabb_min)
    hi = np.asarray(scene.aabb_max)
    verts = np.asarray(scene.triangles.verts)[np.asarray(scene.triangles.valid)]
    assert (verts.reshape(-1, 3) >= lo - 1e-5).all()
    assert (verts.reshape(-1, 3) <= hi + 1e-5).all()
