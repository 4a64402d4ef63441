"""Checkpoint IO: pytree <-> npz (host-side, tiny state ~20 MB).

Replaces Lightning's ModelCheckpoint on the DreamMat path (reference
launch.py:129-132, systems/base.py:58-81): saved state is (geometry field
params, optimizer state, step, rng key). Orbax is unnecessary at this size;
a flat npz keeps resume trivially portable."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any, step: int) -> str:
    """Multi-host safe: rank 0 writes, all hosts barrier afterwards so a
    subsequent load on any rank sees the complete file (reference analog:
    Lightning rank-zero checkpointing + accelerate save_state,
    diffusers_train_controlnet.py:926-949)."""
    from dreammat_tpu.parallel import distributed as dist

    if dist.is_rank_zero():
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        with open(path + ".treedef", "wb") as f:
            pickle.dump({"treedef": treedef, "step": step}, f)
        np.savez(path, **arrays)
    dist.barrier(f"ckpt:{os.path.basename(path)}")
    return path


def load_checkpoint(path: str) -> Tuple[Any, int]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    base = path[: -len(".npz")]
    with open(base + ".treedef", "rb") as f:
        meta = pickle.load(f)
    z = np.load(path)
    leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    tree = jax.tree_util.tree_unflatten(meta["treedef"], leaves)
    return tree, meta["step"]
