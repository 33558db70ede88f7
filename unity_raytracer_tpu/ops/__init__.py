"""Compute ops: batched intersection, shading, the wavefront renderer, BVH."""

from unity_raytracer_tpu.ops.intersect import (
    ray_aabb,
    ray_spheres,
    ray_triangles,
    Hit,
    nearest_hit,
)
from unity_raytracer_tpu.ops.render import render, trace_radiance
from unity_raytracer_tpu.ops.replay import (
    replay_value_and_grad,
    soft_replay_value_and_grad,
    trace_radiance_replay,
    trace_radiance_replay_soft,
)

__all__ = [
    "ray_aabb",
    "ray_spheres",
    "ray_triangles",
    "Hit",
    "nearest_hit",
    "render",
    "trace_radiance",
    "trace_radiance_replay",
    "trace_radiance_replay_soft",
    "replay_value_and_grad",
    "soft_replay_value_and_grad",
]
