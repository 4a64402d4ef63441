"""LoRA adapters for the Flax UNet attention projections.

TPU-native equivalent of diffusers' ``LoRAAttnProcessor`` machinery as the
reference VSD guidance uses it (/root/reference/threestudio_dreammat/
threestudio/models/guidance/stable_diffusion_vsd_guidance.py:160-189): a
rank-r update on every attention q/k/v/out projection of the UNet.

Instead of swapping attention *processors* (a torch-module concept), the
low-rank factors live in their own small pytree and are **merged into the
frozen UNet parameters functionally**::

    W_eff = W + scale * (down @ up)

before a forward pass. This keeps the UNet module, the Pallas attention
kernels, and the torch<->flax converter untouched; autodiff through the
merge gives exactly the LoRA gradients (d loss/d down = scale * dW @ up^T,
etc.). The merge is a handful of [in,r]x[r,out] matmuls per step — noise
next to a UNet forward — and the merged copy lives only inside the jitted
step, so peak HBM grows by one UNet param set, not activations.

Init matches diffusers' ``LoRALinearLayer``: down ~ N(0, 1/r), up = 0, so
the initial delta is exactly zero.
"""

from __future__ import annotations

import zlib
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

# attention projection leaves that receive LoRA (diffusers LoRAAttnProcessor
# wraps to_q/to_k/to_v/to_out.0 of attn1 and attn2)
_TARGET_LEAVES = ("to_q", "to_k", "to_v", "to_out_0")
_ATTN_MODULES = ("attn1", "attn2")


def _walk(tree: Mapping, path: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def _is_target(path: Tuple[str, ...]) -> bool:
    return (
        len(path) >= 3
        and path[-1] == "kernel"
        and path[-2] in _TARGET_LEAVES
        and any(p in _ATTN_MODULES for p in path)
    )


def init_lora_params(
    rng: jax.Array, unet_params: Mapping, rank: int = 4
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Create the low-rank factor pytree for every attention projection in
    ``unet_params``. Keys are '/'-joined parameter paths."""
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, leaf in _walk(unet_params):
        if not _is_target(path):
            continue
        d_in, d_out = leaf.shape
        key = "/".join(path[:-1])
        # stable per-site fold (python str hash is salted per process)
        k = jax.random.fold_in(rng, zlib.crc32(key.encode()) & 0x7FFFFFFF)
        lora[key] = {
            "down": (jax.random.normal(k, (d_in, rank), jnp.float32) / rank),
            "up": jnp.zeros((rank, d_out), jnp.float32),
        }
    if not lora:
        raise ValueError("no attention projections found in unet params")
    return lora


def merge_lora(unet_params: Mapping, lora: Mapping, scale: float = 1.0) -> Dict:
    """Return a copy of ``unet_params`` with ``W + scale * down@up`` applied
    at every LoRA site. Differentiable in both arguments."""

    def rec(tree: Mapping, path: Tuple[str, ...]) -> Dict[str, Any]:
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, Mapping):
                out[k] = rec(v, p)
            elif _is_target(p) and "/".join(p[:-1]) in lora:
                f = lora["/".join(p[:-1])]
                delta = (f["down"] @ f["up"]).astype(v.dtype)
                out[k] = v + scale * delta
            else:
                out[k] = v
        return out

    return rec(unet_params, ())


def lora_param_count(lora: Mapping) -> int:
    return sum(a.size for site in lora.values() for a in site.values())
