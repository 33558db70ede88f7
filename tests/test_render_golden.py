"""Golden-image tests: batched JAX renderer vs the scalar oracle.

The oracle (unity_raytracer_tpu/oracle.py) is the executable transcription of
the reference's forward semantics; agreement here is the 'forward renders
match the reference trace to allclose' requirement. Oracle is O(pixels x
prims x bounces) scalar Python, so images stay small.
"""

import numpy as np
import pytest

from unity_raytracer_tpu import oracle
from unity_raytracer_tpu.models.presets import (
    reference_demo, three_spheres, cornell_box)
from unity_raytracer_tpu.ops.render import render


def _compare(preset_fn, w, h, atol=2e-4, rtol=1e-3, **kw):
    scene, cam, cfg = preset_fn(width=w, height=h, **kw)
    img = np.asarray(render(scene, cam, cfg))
    osc = oracle.from_scene(scene)
    ref = oracle.render(osc, cam, cfg.max_bounces, background=cfg.background)
    assert img.shape == ref.shape == (h, w, 3)
    # fp32 batched vs fp64 scalar: allow small absolute slack, flag big drift
    err = np.abs(img - ref)
    assert np.quantile(err, 0.999) < 5e-3, f"p999 err {np.quantile(err, 0.999)}"
    assert np.mean(err) < atol + rtol * np.mean(np.abs(ref)), (
        f"mean err {err.mean()} vs mean ref {np.abs(ref).mean()}")
    return img, ref


def test_reference_demo_parity():
    """The reconstructed reference demo scene (mirror chain, depth 5)."""
    img, ref = _compare(reference_demo, 32, 32)
    # sanity: scene is actually visible (not all background)
    assert img.max() > 0.05


def test_three_spheres_parity():
    img, ref = _compare(three_spheres, 32, 32)
    assert img.max() > 0.05


def test_cornell_box_parity():
    """Depth-4 with mirror + dielectric: exercises the branching tree."""
    img, ref = _compare(cornell_box, 24, 24)
    assert img.max() > 0.05


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
