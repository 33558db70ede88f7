"""Utilities: configs, image IO, profiling, checkpointing, logging."""

from unity_raytracer_tpu.utils.config import RenderConfig, DiffConfig

__all__ = ["RenderConfig", "DiffConfig"]
