"""Regenerate golden images from the scalar oracle (ground truth).

Usage: python scripts/gen_goldens.py
Writes tests/goldens/<preset>_<WxH>.npy — the oracle render on the display
(0-1) scale. Tests compare the JAX renderer against these so the slow scalar
oracle runs only when semantics change, not on every CI pass.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from unity_raytracer_tpu import oracle
from unity_raytracer_tpu.models.presets import (
    cornell_box, reference_demo, three_spheres)

OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)

CASES = [
    ("reference_demo", reference_demo, 32, 32),
    # the reference scene at its NATIVE 50x50 resolution
    # (Demo-RayTracing/RayTracing.unity:346-352)
    ("reference_demo_native", reference_demo, 50, 50),
    ("three_spheres", three_spheres, 32, 32),
    ("cornell_box", cornell_box, 24, 24),
]

for name, fn, w, h in CASES:
    scene, cam, cfg = fn(width=w, height=h)
    osc = oracle.from_scene(scene)
    img = oracle.render(osc, cam, cfg.max_bounces, background=cfg.background)
    path = OUT / f"{name}_{w}x{h}.npy"
    np.save(path, img.astype(np.float32))
    print(f"wrote {path} (max={img.max():.4f}, mean={img.mean():.4f})")
