"""Scene models: SoA scene representation, cameras, lights, materials, presets."""

from unity_raytracer_tpu.models.scene import (
    Materials,
    Spheres,
    Triangles,
    MeshSet,
    Lights,
    Scene,
    SceneBuilder,
)
from unity_raytracer_tpu.models.camera import Camera, generate_rays

__all__ = [
    "Materials",
    "Spheres",
    "Triangles",
    "MeshSet",
    "Lights",
    "Scene",
    "SceneBuilder",
    "Camera",
    "generate_rays",
]
