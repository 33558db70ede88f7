"""Backward-memory machinery: cfg.remat (checkpointed bounce scan) and
fit.make_chunked_value_and_grad must reproduce the plain value_and_grad
bit-for-tolerance — they change residency, not math."""

import numpy as np

import jax
import jax.numpy as jnp

from unity_raytracer_tpu.fit import (get_params, make_chunked_value_and_grad,
                                     set_params)
from unity_raytracer_tpu.models.camera import generate_rays_blocks
from unity_raytracer_tpu.models.presets import three_spheres
from unity_raytracer_tpu.ops.render import resolve_mode, trace_radiance
from unity_raytracer_tpu.utils.config import DiffConfig

NAMES = ("sphere_centers", "sphere_diffuse", "light_intensities")


def _setup(soft=True):
    scene, cam, cfg = three_spheres(width=24, height=24)
    diff = DiffConfig(soft_shadow_temp=1.0 if soft else 0.0,
                      soft_hit_temp=0.05 if soft else 0.0,
                      straight_through=True)
    cfg = resolve_mode(scene, cfg.with_(max_bounces=1, block_size=8,
                                        diff=diff))
    o, d = generate_rays_blocks(cam, cfg.block_size)
    params = get_params(scene, NAMES)
    target = jax.lax.stop_gradient(
        trace_radiance(scene, o, d, cfg)) * 0.85
    return scene, cfg, o, d, params, target


def _plain_vg(scene, cfg, o, d, target):
    def loss(p):
        s = set_params(scene, p)
        rad = trace_radiance(s, o, d, cfg)
        return jnp.mean((rad - target) ** 2)
    return jax.value_and_grad(loss)


def _assert_tree_close(a, b, rtol=2e-4):
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        scale = max(np.abs(y).max(), 1e-8)
        np.testing.assert_allclose(x, y, rtol=rtol, atol=rtol * scale,
                                   err_msg=k)
        assert np.abs(y).max() > 0, f"no gradient signal for {k}"


def test_chunked_grad_matches_unchunked():
    scene, cfg, o, d, params, target = _setup()
    l0, g0 = jax.jit(_plain_vg(scene, cfg, o, d, target))(params)
    vg = make_chunked_value_and_grad(scene, cfg, o, d, target, chunk=128)
    l1, g1 = jax.jit(vg)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    _assert_tree_close(g1, g0)


def test_remat_grad_matches_plain():
    scene, cfg, o, d, params, target = _setup()
    l0, g0 = jax.jit(_plain_vg(scene, cfg, o, d, target))(params)
    cfg_r = cfg.with_(remat=True)
    l1, g1 = jax.jit(_plain_vg(scene, cfg_r, o, d, target))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    _assert_tree_close(g1, g0, rtol=1e-5)


def test_chunked_plus_remat_hard_path():
    """The bench's composed fwd+bwd configuration: hard temps, remat,
    chunked — still identical gradients."""
    scene, cfg, o, d, params, target = _setup(soft=False)
    l0, g0 = jax.jit(_plain_vg(scene, cfg, o, d, target))(params)
    vg = make_chunked_value_and_grad(scene, cfg.with_(remat=True),
                                     o, d, target, chunk=100)  # pads
    l1, g1 = jax.jit(vg)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    _assert_tree_close(g1, g0)
