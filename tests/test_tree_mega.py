"""Fused dielectric-fork tree kernel (ops/pallas/mega fork=True +
ops/render._trace_tree_mega) vs the composed level-synchronous tree.

The kernel reorders shading/Fresnel arithmetic, so parity is allclose;
at depth 4 a couple of lanes per frame sit on TIR/fork boundaries where
fp-level weight differences compound through the chain — the assertion
bounds both the tail (max) and the bulk (99th percentile).
Runs the Pallas interpreter on CPU.
"""

import numpy as np
import pytest

from unity_raytracer_tpu.models.camera import generate_rays_blocks
from unity_raytracer_tpu.models.presets import cornell_box
from unity_raytracer_tpu.ops.render import trace_radiance


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_cornell_fused_tree_matches_composed(depth):
    scene, cam, cfg = cornell_box(width=24, height=24)
    cfg = cfg.with_(mode="tree", block_size=8, tile_r=64,
                    max_bounces=depth)
    o, d = generate_rays_blocks(cam, cfg.block_size)
    ref = np.asarray(trace_radiance(scene, o, d, cfg, bvh=None))
    fus = np.asarray(trace_radiance(scene, o, d,
                                    cfg.with_(kernel="mega"), bvh=None))
    assert np.isfinite(fus).all()
    diff = np.abs(ref - fus).max(axis=-1)
    # bulk parity tight; the depth-4 tail allows the measured couple of
    # TIR-boundary lanes (0.51 max on the 0-255 radiance scale = 0.2%)
    assert np.quantile(diff, 0.99) < 0.02, np.quantile(diff, 0.99)
    assert diff.max() < 1.0, diff.max()
    assert ref.std() > 1.0  # scene actually exercises the fork


def test_cornell_fused_tree_depth0_background():
    scene, cam, cfg = cornell_box(width=16, height=16)
    cfg = cfg.with_(mode="tree", block_size=8, tile_r=64, max_bounces=0)
    o, d = generate_rays_blocks(cam, cfg.block_size)
    ref = np.asarray(trace_radiance(scene, o, d, cfg, bvh=None))
    fus = np.asarray(trace_radiance(scene, o, d,
                                    cfg.with_(kernel="mega"), bvh=None))
    np.testing.assert_allclose(fus, ref, rtol=1e-3, atol=5e-3)
