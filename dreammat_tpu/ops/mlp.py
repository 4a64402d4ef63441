"""Small MLPs as pure init/apply functions (pytree params).

Replaces the reference's ``VanillaMLP`` and ``make_predictor``
(/root/reference/threestudio_dreammat/threestudio/models/networks.py:150-200,
models/materials/dreammat_material.py:125-161). These are small enough that
plain jnp matmuls hit the MXU after XLA fusion — no Pallas needed; the
hashgrid gather (ops/hashgrid.py) is the interesting kernel.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


def init_mlp(
    rng: jax.Array,
    dims: Sequence[int],
    bias_init: float = 0.0,
) -> Dict[str, list]:
    """Kaiming-uniform init (matches torch.nn.Linear default scheme)."""
    ws, bs = [], []
    for i in range(len(dims) - 1):
        rng, k1, k2 = jax.random.split(rng, 3)
        fan_in = dims[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        ws.append(jax.random.uniform(k1, (dims[i], dims[i + 1]), minval=-bound, maxval=bound))
        b = jax.random.uniform(k2, (dims[i + 1],), minval=-bound, maxval=bound)
        bs.append(b)
    if bias_init != 0.0:
        bs[-1] = jnp.full_like(bs[-1], bias_init)
    return {"w": ws, "b": bs}


def apply_mlp(
    params: Dict[str, list],
    x: jnp.ndarray,
    activation: Callable = jax.nn.relu,
    output_activation: Optional[Callable] = None,
    dtype=None,
) -> jnp.ndarray:
    n = len(params["w"])
    h = x if dtype is None else x.astype(dtype)
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        if dtype is not None:
            w, b = w.astype(dtype), b.astype(dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n - 1:
            h = activation(h)
    if output_activation is not None:
        h = output_activation(h)
    return h


def vanilla_mlp_dims(n_input: int, n_output: int, n_neurons: int = 64, n_hidden_layers: int = 1) -> List[int]:
    """Layer sizing of the reference VanillaMLP (networks.py:150-176):
    input -> n_neurons x n_hidden_layers -> output."""
    return [n_input] + [n_neurons] * n_hidden_layers + [n_output]


def predictor_dims(n_input: int, n_output: int, run_dim: int = 256) -> List[int]:
    """make_predictor sizing (dreammat_material.py:125-161): 3 hidden x 256."""
    return [n_input, run_dim, run_dim, run_dim, n_output]
