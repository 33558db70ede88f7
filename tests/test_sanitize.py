"""Sanitizer analogues (SURVEY.md §5.2).

JAX's functional model designs data races out; what replaces
sanitizers here:

* ``jax.debug_nans`` — the render path must produce no NaN/Inf anywhere
  in intermediate computations for every preset (masked lanes are kept
  finite by construction: guarded where-operands, double-where sqrt).
* ``checkify`` — bounds/NaN checks compiled INTO the jitted intersection
  kernels.
* determinism across shardings lives in test_parallel.py (same pixels
  regardless of device count — the distributed race detector).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from unity_raytracer_tpu.models.presets import (
    cornell_box, mesh_scene, three_spheres)
from unity_raytracer_tpu.ops import bvh as bvhmod
from unity_raytracer_tpu.ops import intersect as isect
from unity_raytracer_tpu.ops.render import render, resolve_mode


@pytest.mark.parametrize("preset", [three_spheres, cornell_box])
def test_render_no_nans_debug_mode(preset):
    """Whole-frame render under jax_debug_nans: any NaN produced by any
    intermediate op raises immediately."""
    scene, cam, cfg = preset(width=24, height=24)
    with jax.debug_nans(True):
        img = np.asarray(render(scene, cam, cfg))
    assert np.isfinite(img).all()


def test_render_bvh_no_nans_debug_mode():
    scene, cam, cfg = mesh_scene(100, width=16, height=16)
    cfg = resolve_mode(scene, cfg.with_(use_bvh=True, kernel="xla"))
    bvh = bvhmod.prepare_bvh(scene, cfg)
    with jax.debug_nans(True):
        img = np.asarray(render(scene, cam, cfg, bvh=bvh))
    assert np.isfinite(img).all()


def test_checkify_intersection_kernels(rng):
    """checkify-instrumented nearest_hit: no NaN and no out-of-bounds
    index errors over random rays (including degenerate directions)."""
    scene, cam, cfg = three_spheres(width=8, height=8)
    o = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 3)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d[0] = [0.0, 0.0, 1.0]
    d[1] = [1e-30, 0.0, 1.0]     # near-degenerate axis component
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    def probe(o, d):
        hit = isect.nearest_hit(scene, o, d)
        checkify.check(jnp.all(~jnp.isnan(hit.t)), "NaN hit distance")
        checkify.check(jnp.all(hit.index >= -1), "index underflow")
        return hit.t

    checked = checkify.checkify(
        jax.jit(probe),
        errors=checkify.user_checks | checkify.index_checks
        | checkify.nan_checks)
    err, t = checked(o, d)
    err.throw()  # raises if any check tripped
    assert np.isfinite(np.asarray(t)[np.asarray(t) < np.inf]).all()


def test_grad_no_nans(rng):
    """Backward pass under debug_nans: masked-lane gradients must stay
    finite (the double-where constructions this repo uses throughout)."""
    scene, cam, cfg = three_spheres(width=12, height=12)
    cfg = resolve_mode(scene, cfg.with_(max_bounces=1))
    from unity_raytracer_tpu.fit import get_params, set_params
    from unity_raytracer_tpu.models.camera import generate_rays
    from unity_raytracer_tpu.ops.render import trace_radiance

    o, d = generate_rays(cam)
    params = get_params(scene, ("sphere_centers",))

    def loss(p):
        s = set_params(scene, p)
        return jnp.mean(trace_radiance(s, o, d, cfg) ** 2)

    with jax.debug_nans(True):
        g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
