"""Utility-layer tests: image IO, metrics logging, debug maps, tile
orchestration with fault injection."""

import numpy as np
import pytest

import jax.numpy as jnp

from unity_raytracer_tpu.models.presets import three_spheres
from unity_raytracer_tpu.ops.debugviz import debug_maps
from unity_raytracer_tpu.ops.render import render, resolve_mode, trace_radiance
from unity_raytracer_tpu.utils import image as imgutil
from unity_raytracer_tpu.utils.logging import MetricsLogger, read_jsonl
from unity_raytracer_tpu.utils.orchestrator import render_tiled_orchestrated


def test_png_roundtrip_header(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (17, 23, 3)).astype(np.float32)
    p = tmp_path / "x.png"
    imgutil.write_png(p, img)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR dims
    import struct
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (23, 17)


def test_tonemap_clamps():
    x = np.asarray([[-1.0, 0.5, 2.0]])[..., None] * np.ones(3)
    out = imgutil.tonemap(x)
    assert out.min() == 0 and out.max() == 255


def test_metrics_logger(tmp_path):
    p = tmp_path / "m.jsonl"
    log = MetricsLogger(p)
    log.log("step", loss=1.5, i=3)
    log.log("step", loss=0.5, i=4)
    recs = read_jsonl(p)
    assert len(recs) == 2 and recs[1]["loss"] == 0.5


def test_debug_maps_shapes():
    scene, cam, _ = three_spheres(width=24, height=24)
    maps = debug_maps(scene, cam)
    assert maps["normal"].shape == (24, 24, 3)
    assert maps["depth"].shape == (24, 24)
    assert maps["hit_id"].shape == (24, 24, 3)
    # the scene fills part of the frame: some hits, some background
    hit_frac = float((np.asarray(maps["depth"]) < 1.0).mean())
    assert 0.05 < hit_frac <= 1.0
    assert np.isfinite(np.asarray(maps["normal"])).all()
    # shadow fraction within [0,1]
    sh = np.asarray(maps["shadow"])
    assert (sh >= 0).all() and (sh <= 1).all()


def test_orchestrator_matches_direct():
    scene, cam, cfg = three_spheres(width=32, height=32)
    ref = np.asarray(render(scene, cam, cfg))
    img, reports = render_tiled_orchestrated(scene, cam, cfg,
                                             rows_per_tile=10)
    assert all(r.ok for r in reports)
    np.testing.assert_allclose(img, ref, rtol=1e-6, atol=1e-6)


def test_orchestrator_retries_transient_fault():
    scene, cam, cfg = three_spheres(width=16, height=16)
    cfg = resolve_mode(scene, cfg)
    calls = {"n": 0}

    def flaky(s, o, d, c, b):
        calls["n"] += 1
        if calls["n"] == 2:  # fail the 2nd tile once
            raise RuntimeError("injected fault")
        return trace_radiance(s, o, d, c, bvh=b)

    img, reports = render_tiled_orchestrated(
        scene, cam, cfg, rows_per_tile=8, max_retries=2, trace_fn=flaky)
    assert all(r.ok for r in reports)
    assert any(r.attempts > 1 for r in reports)
    ref = np.asarray(render(scene, cam, cfg))
    np.testing.assert_allclose(img, ref, rtol=1e-6, atol=1e-6)


def test_orchestrator_reports_permanent_failure():
    scene, cam, cfg = three_spheres(width=16, height=16)

    def dead(s, o, d, c, b):
        raise RuntimeError("always down")

    img, reports = render_tiled_orchestrated(
        scene, cam, cfg, rows_per_tile=8, max_retries=1, trace_fn=dead)
    assert not any(r.ok for r in reports)
    assert (img == 0).all()
