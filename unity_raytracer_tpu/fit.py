"""Differentiable inverse rendering (baseline config 4).

Recover scene parameters (sphere positions, materials, light intensities)
from a target image by pixel-gradient descent — the capability the
reference's C# forward tracer could never have. The forward model is the
same wavefront renderer; gradients flow through the unrolled bounce chain
(smoothed visibility for silhouettes, see utils/config.DiffConfig).

Design: the optimizable parameters are a small pytree ``FitParams``
installed into a template scene with ``dataclasses.replace`` — the scene
stays one static-shape pytree, so the whole optimization step jits once.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unity_raytracer_tpu.models.camera import Camera
from unity_raytracer_tpu.models.scene import Scene
from unity_raytracer_tpu.ops.render import render, resolve_mode
from unity_raytracer_tpu.utils.config import DiffConfig, RenderConfig
from unity_raytracer_tpu.utils import checkpoint as ckpt


# Parameter classes that can be optimized; each names a leaf of the scene.
PARAM_PATHS = {
    "sphere_centers": ("spheres", "centers"),
    "sphere_radius_sq": ("spheres", "radius_sq"),
    "sphere_diffuse": ("spheres", "materials", "diffuse"),
    "sphere_ambient": ("spheres", "materials", "ambient"),
    "sphere_specular": ("spheres", "materials", "specular"),
    "sphere_mirror": ("spheres", "materials", "mirror"),
    "tri_verts": ("triangles", "verts"),
    "tri_diffuse": ("triangles", "materials", "diffuse"),
    "light_positions": ("lights", "positions"),
    "light_intensities": ("lights", "intensities"),
}


def get_params(scene: Scene, names: Tuple[str, ...]) -> Dict[str, jnp.ndarray]:
    out = {}
    for name in names:
        node = scene
        for attr in PARAM_PATHS[name]:
            node = getattr(node, attr)
        out[name] = node
    return out


def set_params(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    for name, value in params.items():
        path = PARAM_PATHS[name]
        scene = _replace_path(scene, path, value)
    return scene


def _replace_path(node, path, value):
    if len(path) == 1:
        return dataclasses.replace(node, **{path[0]: value})
    child = getattr(node, path[0])
    return dataclasses.replace(
        node, **{path[0]: _replace_path(child, path[1:], value)})


@dataclass(frozen=True)
class FitConfig:
    param_names: Tuple[str, ...] = ("sphere_centers", "sphere_diffuse")
    learning_rate: float = 0.05
    steps: int = 200
    soft_shadow_temp: float = 1.0
    soft_hit_temp: float = 0.05
    log_every: int = 20
    checkpoint_every: int = 0          # 0 = disabled
    checkpoint_path: Optional[str] = None


class FitResult(NamedTuple):
    scene: Scene
    params: Dict[str, jnp.ndarray]
    losses: np.ndarray
    step: int


def make_loss_fn(template: Scene, cam: Camera, rcfg: RenderConfig,
                 target: jnp.ndarray) -> Callable:
    """Pixel-MSE loss. ``rcfg`` should carry a soft DiffConfig so silhouette
    gradients exist; forward stays hard when straight_through=True."""
    rcfg = resolve_mode(template, rcfg)

    def loss_fn(params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        scene = set_params(template, params)
        img = render(scene, cam, rcfg)
        return jnp.mean((img - target) ** 2)

    return loss_fn


def fit(template: Scene, cam: Camera, rcfg: RenderConfig,
        target: jnp.ndarray, cfg: FitConfig,
        init_params: Optional[Dict[str, jnp.ndarray]] = None,
        resume_from: Optional[str] = None,
        grad_transform: Optional[Callable] = None) -> FitResult:
    """Adam descent on pixel MSE.

    ``grad_transform(grads, params) -> grads`` hooks in multi-device grad
    psum when running under shard_map (see parallel/).
    """
    rcfg = resolve_mode(template, rcfg).with_(
        diff=DiffConfig(soft_shadow_temp=cfg.soft_shadow_temp,
                        soft_hit_temp=cfg.soft_hit_temp,
                        straight_through=True))
    loss_fn = make_loss_fn(template, cam, rcfg, target)
    tx = optax.adam(cfg.learning_rate)

    params = dict(init_params or get_params(template, cfg.param_names))
    opt_state = tx.init(params)
    start_step = 0
    if resume_from:
        start_step, params, opt_state, _, _ = ckpt.load_checkpoint(resume_from)

    @jax.jit
    def step_fn(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        if grad_transform is not None:
            grads = grad_transform(grads, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    step = start_step
    for step in range(start_step, cfg.steps):
        params, opt_state, loss = step_fn(params, opt_state)
        losses.append(float(loss))
        if cfg.log_every and (step % cfg.log_every == 0 or
                              step == cfg.steps - 1):
            print(f"[fit] step {step:5d} loss {float(loss):.6e}")
        if (cfg.checkpoint_every and cfg.checkpoint_path
                and (step + 1) % cfg.checkpoint_every == 0):
            ckpt.save_checkpoint(cfg.checkpoint_path, step + 1, params,
                                 opt_state)

    return FitResult(scene=set_params(template, params), params=params,
                     losses=np.asarray(losses), step=step + 1)
