"""Dead-fork compaction in the refraction tree (_trace_tree): lane
arrays stay O(tree_cap * n_rays) instead of 2^depth, without changing
the image when only exactly-dead children are dropped."""

import numpy as np

from unity_raytracer_tpu.models.presets import cornell_box
from unity_raytracer_tpu.ops.render import render, resolve_mode


def test_tree_cap_matches_uncapped_depth6():
    """Cornell at depth 6: uncapped would run 64x lanes; the capped tree
    must produce the same image (only weight-0 lanes dropped at this
    scene's dielectric coverage)."""
    scene, cam, cfg = cornell_box(width=48, height=48)
    cfg = resolve_mode(scene, cfg.with_(max_bounces=6))
    assert cfg.mode == "tree"
    img_uncapped = np.asarray(render(scene, cam, cfg.with_(tree_cap=0)))
    img_capped = np.asarray(render(scene, cam, cfg.with_(tree_cap=4)))
    assert np.isfinite(img_capped).all()
    np.testing.assert_allclose(img_capped, img_uncapped,
                               rtol=1e-5, atol=1e-5)
    assert img_capped.std() > 0.01


def test_tree_cap_default_golden_unchanged():
    """The default cap must not change the shipped cornell preset
    (depth 4, 2 dielectric spheres)."""
    scene, cam, cfg = cornell_box(width=32, height=32)
    cfg = resolve_mode(scene, cfg)
    img0 = np.asarray(render(scene, cam, cfg.with_(tree_cap=0)))
    img1 = np.asarray(render(scene, cam, cfg))
    np.testing.assert_allclose(img1, img0, rtol=1e-5, atol=1e-5)
