"""Inverse rendering (baseline config 4): recover scene params by
pixel-gradient descent, plus checkpoint/resume."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from unity_raytracer_tpu import fit as fitmod
from unity_raytracer_tpu.fit import FitConfig, fit, get_params, set_params
from unity_raytracer_tpu.models.presets import three_spheres
from unity_raytracer_tpu.ops.render import render, resolve_mode
from unity_raytracer_tpu.utils import checkpoint as ckpt


from unity_raytracer_tpu.models.camera import Camera


@pytest.fixture(scope="module")
def problem():
    # zoomed probe so the spheres fill the frame: silhouette + interior
    # gradients both live at 48x48
    scene, _, cfg = three_spheres(width=48, height=48)
    cfg = resolve_mode(scene, cfg.with_(max_bounces=0))
    cam = Camera.from_fov(position=(0, 5, 6), look_at=(0, 2.5, 26),
                          fov_y_deg=40.0, width=48, height=48)
    target = render(scene, cam, cfg)
    return scene, cam, cfg, target


def test_recover_sphere_centers(problem):
    """Silhouette (soft-hit) gradients pull shifted spheres back home."""
    scene, cam, cfg, target = problem
    true_params = get_params(scene, ("sphere_centers",))
    init = {"sphere_centers": true_params["sphere_centers"] + jnp.asarray(
        [[0.4, -0.3, 0.4], [-0.4, 0.25, -0.5], [0.3, 0.4, 0.25]])}
    fcfg = FitConfig(param_names=("sphere_centers",), learning_rate=0.02,
                     steps=300, soft_shadow_temp=1.0, soft_hit_temp=0.05,
                     log_every=0)
    res = fit(scene, cam, cfg, target, fcfg, init_params=init)
    assert res.losses[-1] < res.losses[0] * 0.15, (
        f"loss {res.losses[0]} -> {res.losses[-1]}")
    err = np.abs(np.asarray(res.params["sphere_centers"])
                 - np.asarray(true_params["sphere_centers"]))
    assert err.max() < 0.3, f"center error {err.max()}"


def test_recover_sphere_diffuse(problem):
    """Material recovery is essentially exact (smooth, well-conditioned)."""
    scene, cam, cfg, target = problem
    true_params = get_params(scene, ("sphere_diffuse",))
    init = {"sphere_diffuse": jnp.clip(
        true_params["sphere_diffuse"] + 0.2, 0.0, 1.0)}
    fcfg = FitConfig(param_names=("sphere_diffuse",), learning_rate=0.02,
                     steps=200, soft_shadow_temp=0.0, soft_hit_temp=0.0,
                     log_every=0)
    res = fit(scene, cam, cfg, target, fcfg, init_params=init)
    assert res.losses[-1] < res.losses[0] * 1e-3
    err = np.abs(np.asarray(res.params["sphere_diffuse"])
                 - np.asarray(true_params["sphere_diffuse"]))
    assert err.max() < 0.02, f"diffuse error {err.max()}"


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.asarray([1, 2, 3])}
    opt_state = {"m": jnp.zeros((2, 3))}
    p = tmp_path / "ck.npz"
    ckpt.save_checkpoint(p, 42, params, opt_state, extra={"note": "hi"})
    step, p2, o2, rng, extra = ckpt.load_checkpoint(p)
    assert step == 42 and extra == {"note": "hi"} and rng is None
    np.testing.assert_array_equal(np.asarray(p2["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(o2["m"]),
                                  np.asarray(opt_state["m"]))


def test_fit_resume_continues(problem, tmp_path):
    scene, cam, cfg, target = problem
    true_params = get_params(scene, ("sphere_centers",))
    init = {"sphere_centers": true_params["sphere_centers"] + 0.5}
    path = str(tmp_path / "fit.npz")

    fcfg1 = FitConfig(param_names=("sphere_centers",), learning_rate=0.03,
                      steps=10, log_every=0, checkpoint_every=10,
                      checkpoint_path=path)
    fit(scene, cam, cfg, target, fcfg1, init_params=init)

    fcfg2 = dataclasses.replace(fcfg1, steps=20)
    res = fit(scene, cam, cfg, target, fcfg2, resume_from=path)
    assert res.step == 20
    assert len(res.losses) == 10  # only the resumed segment ran


def test_set_get_params_roundtrip(problem):
    scene, *_ = problem
    params = get_params(scene, ("sphere_centers", "light_intensities"))
    s2 = set_params(scene, {k: v + 1.0 for k, v in params.items()})
    p2 = get_params(s2, ("sphere_centers", "light_intensities"))
    for k in params:
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(params[k]) + 1.0)
