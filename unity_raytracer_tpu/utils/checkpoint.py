"""Checkpoint / resume for optimization loops.

The reference has no persistence of any kind (its framebuffer and scene are
rebuilt every frame, RayTracingSetup.cs:120-128, 212-221). The inverse-
rendering loop (baseline config 4) needs restartable state: ``(step, params,
optimizer state, PRNG key)`` — stored as one .npz of flattened pytree leaves
plus the pickled treedefs (internal trusted artifacts).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(path, step: int, params: Any, opt_state: Any = None,
                    rng_key=None, extra: Optional[dict] = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    p_leaves, p_tree = jax.tree_util.tree_flatten(params)
    o_leaves, o_tree = jax.tree_util.tree_flatten(opt_state)
    payload = {
        f"p{i}": np.asarray(x) for i, x in enumerate(p_leaves)
    }
    payload.update({f"o{i}": np.asarray(x) for i, x in enumerate(o_leaves)})
    payload["step"] = np.asarray(step)
    if rng_key is not None:
        payload["rng"] = np.asarray(jax.random.key_data(rng_key))
    meta = {
        "p_tree": pickle.dumps(p_tree),
        "o_tree": pickle.dumps(o_tree),
        "n_p": len(p_leaves),
        "n_o": len(o_leaves),
        "extra": extra or {},
        "has_rng": rng_key is not None,
    }
    payload["meta"] = np.frombuffer(pickle.dumps(meta), dtype=np.uint8)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **payload)
    tmp.replace(path)  # atomic publish


def load_checkpoint(path) -> Tuple[int, Any, Any, Any, dict]:
    """Returns (step, params, opt_state, rng_key_or_None, extra)."""
    with np.load(Path(path), allow_pickle=False) as z:
        meta = pickle.loads(z["meta"].tobytes())
        p_leaves = [z[f"p{i}"] for i in range(meta["n_p"])]
        o_leaves = [z[f"o{i}"] for i in range(meta["n_o"])]
        params = jax.tree_util.tree_unflatten(
            pickle.loads(meta["p_tree"]), p_leaves)
        opt_state = jax.tree_util.tree_unflatten(
            pickle.loads(meta["o_tree"]), o_leaves)
        step = int(z["step"])
        rng = (jax.random.wrap_key_data(np.asarray(z["rng"]))
               if meta["has_rng"] else None)
        return step, params, opt_state, rng, meta["extra"]
