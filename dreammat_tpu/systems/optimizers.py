"""Optimizers: optax factories + an Adan implementation.

Reference parity: ``parse_optimizer`` name->optimizer dispatch
(/root/reference/threestudio_dreammat/threestudio/systems/utils.py:34-103)
and the custom fused Adan optimizer (systems/optimizers.py:23-315), here as
an optax GradientTransformation (the TPU-native fusion happens in XLA)."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jnp.ndarray
    m: Any  # EMA of grads
    v: Any  # EMA of grad differences
    n: Any  # EMA of squared (g + (1-b2) * diff)
    prev_grad: Any


def adan(
    learning_rate: float = 1e-3,
    b1: float = 0.98,
    b2: float = 0.92,
    b3: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adan (Adaptive Nesterov Momentum, arXiv:2208.06677) matching the
    reference's hyperparameter convention (betas are decay rates)."""

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdanState(jnp.zeros([], jnp.int32), z, z, z,
                         jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        count = state.count + 1
        is_first = count == 1
        diff = jax.tree_util.tree_map(
            lambda g, pg: jnp.where(is_first, jnp.zeros_like(g), g - pg),
            grads, state.prev_grad,
        )
        m = jax.tree_util.tree_map(lambda m_, g: m_ * b1 + (1 - b1) * g, state.m, grads)
        v = jax.tree_util.tree_map(lambda v_, d: v_ * b2 + (1 - b2) * d, state.v, diff)
        n = jax.tree_util.tree_map(
            lambda n_, g, d: n_ * b3 + (1 - b3) * (g + b2 * d) ** 2, state.n, grads, diff
        )
        c = count.astype(jnp.float32)
        bc1 = 1 - b1**c
        bc2 = 1 - b2**c
        bc3 = 1 - b3**c

        def upd(m_, v_, n_, p):
            denom = jnp.sqrt(n_ / bc3) + eps
            step = (m_ / bc1 + b2 * v_ / bc2) / denom
            step = step + weight_decay * p
            return -learning_rate * step

        updates = jax.tree_util.tree_map(upd, m, v, n,
                                         params if params is not None else m)
        return updates, AdanState(count, m, v, n, grads)

    return optax.GradientTransformation(init_fn, update_fn)


def parse_optimizer(cfg: Dict[str, Any]) -> optax.GradientTransformation:
    """name + args -> optax transformation (reference systems/utils.py:34-76)."""
    name = cfg.get("name", "Adam")
    args = dict(cfg.get("args", {}))
    lr = args.pop("lr", 1e-3)
    betas = args.pop("betas", (0.9, 0.999))
    eps = args.pop("eps", 1e-8)
    weight_decay = args.pop("weight_decay", 0.0)
    name_l = name.lower()
    if name_l in ("adam", "adamw"):
        if weight_decay:
            return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
        return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if name_l == "adan":
        return adan(lr, b1=betas[0] if betas else 0.98,
                    b2=betas[1] if len(betas) > 1 else 0.92, eps=eps,
                    weight_decay=weight_decay)
    if name_l == "sgd":
        return optax.sgd(lr, momentum=args.pop("momentum", 0.0))
    raise ValueError(f"unknown optimizer '{name}'")


def parse_scheduler(cfg: Optional[Dict[str, Any]], base_lr: float):
    """Minimal scheduler parity (reference systems/utils.py:79-103)."""
    if not cfg:
        return None
    name = cfg.get("name", "").lower()
    if name == "exponentiallr":
        gamma = cfg.get("args", {}).get("gamma", 0.99)
        return lambda step: base_lr * gamma**step
    if name == "linearlr":
        total = cfg.get("args", {}).get("total_iters", 1000)
        return lambda step: base_lr * jnp.maximum(0.0, 1.0 - step / total)
    raise ValueError(f"unknown scheduler '{name}'")
