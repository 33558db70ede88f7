"""Golden-image tests: batched JAX renderer vs oracle-generated goldens.

tests/goldens/*.npy are rendered by the scalar oracle
(scripts/gen_goldens.py) — the executable transcription of the reference's
forward semantics. The default (fast) tests compare against those stored
goldens; ``-m slow`` re-runs the live oracle end to end.
"""

from pathlib import Path

import numpy as np
import pytest

from unity_raytracer_tpu import oracle
from unity_raytracer_tpu.models.presets import (
    reference_demo, three_spheres, cornell_box)
from unity_raytracer_tpu.ops.render import render

GOLDENS = Path(__file__).parent / "goldens"

CASES = {
    "reference_demo": (reference_demo, 32, 32),
    # the reference's NATIVE image-plane resolution, 50x50
    # (Demo-RayTracing/RayTracing.unity:346-352): the closes-the-loop
    # parity artifact — measured max abs err 2.1e-6 on the 0-1 scale
    "reference_demo_native": (reference_demo, 50, 50),
    "three_spheres": (three_spheres, 32, 32),
    "cornell_box": (cornell_box, 24, 24),
}


def _check(img, ref, h, w):
    assert img.shape == ref.shape == (h, w, 3)
    err = np.abs(img - ref)
    assert np.quantile(err, 0.999) < 5e-3, f"p999 err {np.quantile(err, 0.999)}"
    assert np.mean(err) < 2e-4 + 1e-3 * np.mean(np.abs(ref)), (
        f"mean err {err.mean()} vs mean ref {np.abs(ref).mean()}")


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    fn, w, h = CASES[name]
    scene, cam, cfg = fn(width=w, height=h)
    img = np.asarray(render(scene, cam, cfg))
    ref = np.load(GOLDENS / f"{name}_{w}x{h}.npy")
    _check(img, ref, h, w)
    assert img.max() > 0.05  # scene actually visible


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CASES))
def test_live_oracle_parity(name):
    """Full live comparison against the scalar oracle (slow)."""
    fn, w, h = CASES[name]
    scene, cam, cfg = fn(width=w, height=h)
    img = np.asarray(render(scene, cam, cfg))
    osc = oracle.from_scene(scene)
    ref = oracle.render(osc, cam, cfg.max_bounces, background=cfg.background)
    _check(img, ref, h, w)


def test_chunked_matches_unchunked():
    scene, cam, cfg = three_spheres(width=32, height=32)
    full = np.asarray(render(scene, cam, cfg))
    chunked = np.asarray(render(scene, cam, cfg.with_(ray_chunk=128)))
    np.testing.assert_allclose(full, chunked, rtol=1e-6, atol=1e-6)


def test_mirror_chain_vs_tree_equivalence():
    """On a mirror-only scene the linear chain and the branching tree are
    the same function."""
    scene, cam, cfg = three_spheres(width=24, height=24)
    a = np.asarray(render(scene, cam, cfg.with_(mode="scan")))
    b = np.asarray(render(scene, cam, cfg.with_(mode="tree")))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
