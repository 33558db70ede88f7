"""Cross-device reductions for distributed intersection.

The reference has no communication layer at all (SURVEY.md §5.8). Here the
one nontrivial collective a distributed ray tracer needs is the
**lexicographic nearest-hit combine**: every device holds a partial
``(t, payload)`` per ray; the winner is the minimum t, with the reference's
tie-breaking (first category/index wins — Scene.cs strict ``>`` updates)
preserved by breaking ties on the payload key.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def min_hit_combine(t: jnp.ndarray, key: jnp.ndarray,
                    axis_name: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-reduce argmin over a mesh axis.

    ``t [N]`` float32 partial distances (+inf = miss), ``key [N]`` int32
    payload (packed hit id). Returns the (t, key) of the global winner on
    every device. Ties in t resolve to the smallest key, which encodes the
    reference's evaluation order when keys are packed monotonically
    (category major, index minor).
    """
    t_min = jax.lax.pmin(t, axis_name)
    # devices not holding the winner contribute key=INT32_MAX
    candidate = jnp.where(t == t_min, key, jnp.int32(2**31 - 1))
    key_min = jax.lax.pmin(candidate, axis_name)
    return t_min, key_min


def pack_hit(kind: jnp.ndarray, index: jnp.ndarray,
             index_bits: int = 27) -> jnp.ndarray:
    """Pack (kind, index) into one sortable int32: kind-major, index-minor —
    matches the mesh->sphere->loose evaluation order when kind codes are
    ordered that way (they are: 1, 2, 3; miss=0 never packs)."""
    return (kind.astype(jnp.int32) << index_bits) | index.astype(jnp.int32)


def unpack_hit(key: jnp.ndarray,
               index_bits: int = 27) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mask = (1 << index_bits) - 1
    return (key >> index_bits).astype(jnp.int32), (key & mask).astype(jnp.int32)
