"""Pixel-block swizzle: remap row-major pixels into bs x bs screen blocks.

The packet traversal kernels (ops/pallas/traverse_mk*) give each TILE_R-lane
tile ONE shared cursor, so a tile pays the UNION of its rays' BVH node sets.
Row-major lanes make a 1024-ray tile half a 1920-wide scanline — long and
thin, poor spatial coherence. Swizzling lanes into 32x32 screen blocks makes
each tile a compact square: measured on the flagship mesh100k scene this
cuts union node visits per tile ~7x for primary rays and lets most shadow
tiles exit at the root test (scripts/divergence_study.py).

The reference sorts its pixel loop for cache locality for the same reason
("Traverse order swapped for better cache usage",
Demo-RayTracing/RayTracingSetup.cs:286) — here the "cache line" is the
packet tile.

``block_perm`` returns (perm, inv) as int32 numpy arrays with
``flat_swizzled = flat_rowmajor[perm]`` and ``flat_rowmajor =
flat_swizzled[inv]``. Partial edge blocks (H or W not divisible by bs) stay
contiguous and coherent.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np


@functools.lru_cache(maxsize=32)
def block_perm(width: int, height: int, bs: int = 32
               ) -> Tuple[np.ndarray, np.ndarray]:
    if bs <= 1:
        eye = np.arange(width * height, dtype=np.int32)
        return eye, eye
    ys, xs = np.mgrid[0:height, 0:width]
    # unique sort key: (block row, block col, in-block row-major offset)
    key = (((ys // bs) * ((width + bs - 1) // bs) + (xs // bs))
           * (bs * bs) + (ys % bs) * bs + (xs % bs))
    perm = np.argsort(key.ravel(), kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=np.int32)
    return perm, inv
