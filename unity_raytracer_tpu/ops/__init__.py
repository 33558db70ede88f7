"""Compute ops: batched intersection, shading, the wavefront renderer, BVH."""

from unity_raytracer_tpu.ops.intersect import (
    ray_aabb,
    ray_spheres,
    ray_triangles,
    Hit,
    nearest_hit,
)
from unity_raytracer_tpu.ops.render import render, trace_radiance

__all__ = [
    "ray_aabb",
    "ray_spheres",
    "ray_triangles",
    "Hit",
    "nearest_hit",
    "render",
    "trace_radiance",
]
