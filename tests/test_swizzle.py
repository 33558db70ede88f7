"""Block-order lane pipeline: raygen + unswizzle round trips exactly.

The flagship frame renders 1920x1080 with 32x32 blocks, so the height
pads to 1088 — these tests cover the non-divisible padding path at
small sizes, asserting bitwise equality with row-major raygen.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unity_raytracer_tpu.models.camera import (
    Camera, generate_rays, generate_rays_blocks)
from unity_raytracer_tpu.utils.swizzle import padded_dims, unswizzle_image


@pytest.mark.parametrize("w,h,bs", [
    (32, 32, 32),   # exactly one block
    (40, 24, 16),   # both dims pad (40->48, 24->32)
    (64, 24, 32),   # height pads only (24->32) — the 1080p shape
    (17, 9, 8),     # odd dims
    (16, 16, 1),    # bs<=1 degenerates to row-major
])
def test_block_raygen_unswizzles_to_rowmajor(w, h, bs):
    cam = Camera.make(position=(0, 1, -3), forward=(0.1, -0.2, 1.0),
                      dist=1.0, half_h=0.8, half_v=0.8 * h / w,
                      width=w, height=h)
    o_r, d_r = jax.jit(generate_rays)(cam)
    o_b, d_b = jax.jit(lambda c: generate_rays_blocks(c, bs))(cam)

    wp, hp = padded_dims(w, h, bs)
    assert o_b.shape[0] == wp * hp

    # treating directions as "radiance", unswizzling must reproduce the
    # row-major image bitwise (same per-pixel arithmetic, pure relayout)
    img_b = np.asarray(jax.jit(
        lambda d: unswizzle_image(d, w, h, bs))(d_b))
    img_r = np.asarray(d_r).reshape(h, w, 3)
    np.testing.assert_array_equal(img_b, img_r)

    # pad lanes carry valid unit rays (they trace, then get cropped)
    n = np.linalg.norm(np.asarray(d_b), axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-6)


def test_padded_dims():
    assert padded_dims(1920, 1080, 32) == (1920, 1088)
    assert padded_dims(64, 64, 32) == (64, 64)
    assert padded_dims(10, 10, 1) == (10, 10)
