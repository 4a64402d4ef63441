"""Device mesh + sharding rules.

The reference's only parallelism is implicit Lightning DDP / HF-accelerate
data parallelism over NCCL (SURVEY §2.4). TPU-native mapping: a
``jax.sharding.Mesh`` with axes

- ``data``  — batch / replica-group axis (DDP equivalent; gradients
  all-reduce over ICI via psum inserted by XLA)
- ``model`` — tensor-parallel axis (UNet/ControlNet attention-head and MLP
  column sharding; not present in the reference, provided as scale-out
  headroom for large-batch CSD and ControlNet training)

plus shard_map helpers for the "sequence-parallel slot" of this framework:
the rays x samples dimension of Monte-Carlo shading (SURVEY §5
long-context discussion).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, tree):
    """Shard leading axis of every leaf over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# ---------------------------------------------------------------------------
# tensor-parallel param sharding for the Flax diffusion modules
# ---------------------------------------------------------------------------

def _tp_spec_for(path: Tuple[str, ...], shape: Tuple[int, ...]) -> P:
    """Column-shard attention/MLP projections, row-shard their outputs.
    XLA inserts the reduce-scatter/all-gather collectives."""
    name = "/".join(str(p) for p in path)
    if len(shape) == 2:
        if any(k in name for k in ("to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "net_0_proj", "fc1", "linear_1")):
            return P(None, "model")   # column parallel
        if any(k in name for k in ("to_out_0", "out_proj", "net_2", "fc2", "linear_2")):
            return P("model", None)   # row parallel
    return P()  # replicate convs, norms, embeddings


def tp_shard_params(mesh: Mesh, params) -> Any:
    """Place diffusion params with tensor-parallel NamedShardings."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    for path, leaf in flat:
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        spec = _tp_spec_for(keys, np.shape(leaf))
        # shard only if the dimension divides evenly
        ok = True
        for ax, axis_name in enumerate(spec):
            if axis_name is not None and np.shape(leaf)[ax] % mesh.shape[axis_name] != 0:
                ok = False
        sharding = NamedSharding(mesh, spec if ok else P())
        out.append(jax.device_put(leaf, sharding))
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# ray/sample sharding for MC shading (the "SP slot")
# ---------------------------------------------------------------------------

def shard_rays(mesh: Mesh, fn, *args):
    """Run ``fn`` with the leading (pixel/ray) axis of args split over the
    whole mesh (data*model). Pads to a multiple of the mesh size."""
    n = mesh.devices.size
    flat_axis_sizes = {np.shape(a)[0] for a in jax.tree_util.tree_leaves(args)}
    R = max(flat_axis_sizes)
    pad = (-R) % n

    def pad_leaf(x):
        if pad == 0:
            return x
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)

    args = jax.tree_util.tree_map(pad_leaf, args)
    spec = P(("data", "model"))
    from jax.experimental.shard_map import shard_map

    fn_sharded = shard_map(
        fn, mesh=mesh, in_specs=spec, out_specs=spec, check_rep=False
    )
    out = fn_sharded(*args)
    return jax.tree_util.tree_map(lambda x: x[:R], out)
