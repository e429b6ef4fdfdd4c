"""Checkpointing: params / optimizer state / bn state as flat npz.

The reference checkpoints only inside Ray trials (torch.save of state dicts,
/root/reference/src/ray_tune.py:74-89); here any pytree checkpoints anywhere —
used by the sweep runner's per-trial best-model snapshots and resumable by
the plain CLI.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def _normalize(path: str) -> str:
    # np.savez appends '.npz' when missing; mirror that in both directions so
    # save_checkpoint('ckpt') and load_checkpoint('ckpt') agree
    return path if path.endswith(".npz") else path + ".npz"


def _flatten(tree) -> Tuple[dict, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    return arrays, treedef


def save_checkpoint(path: str, tree, metadata: dict | None = None) -> None:
    path = _normalize(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays, treedef = _flatten(tree)
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    if metadata:
        arrays["__meta__"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path: str, example_tree):
    """Restore a pytree with the structure of ``example_tree``.

    The stored treedef string must match ``example_tree``'s — restoring into
    a structurally different tree would silently mis-assign leaves whenever
    the shapes happen to line up.
    """
    path = _normalize(path)
    with np.load(path, allow_pickle=False) as f:
        leaves_ex, treedef = jax.tree_util.tree_flatten(example_tree)
        stored_def = bytes(f["__treedef__"]).decode()
        if stored_def != str(treedef):
            raise ValueError(
                f"checkpoint treedef mismatch:\n  stored: {stored_def[:200]}"
                f"\n  expected: {str(treedef)[:200]}")
        leaves = [f[f"leaf_{i}"] for i in range(len(leaves_ex))]
        meta = None
        if "__meta__" in f:
            meta = json.loads(bytes(f["__meta__"]).decode())
    import jax.numpy as jnp
    tree = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves])
    return tree, meta
