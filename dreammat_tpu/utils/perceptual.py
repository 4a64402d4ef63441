"""Perceptual (VGG-feature) distance for image supervision.

From-scratch equivalent of the reference's ``PerceptualLoss``
(/root/reference/threestudio_dreammat/threestudio/utils/perceptual/
perceptual.py — an LPIPS-style VGG16 feature distance). The VGG16 conv
tower is rebuilt in JAX; pretrained weights load from
``<cache_dir>/vgg16.{safetensors,bin,pth}`` when present (torchvision
key layout ``features.N.weight``). Without weights the tower runs with a
deterministic random init — random conv features still yield a usable
perceptual metric for low-level structure (documented fallback; real
LPIPS parity requires the weights, same as every pretrained asset here).

The whole distance is one jittable pure function over (params, x, y).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu

# VGG16 conv layout: (out_channels, pool_before) per conv, torchvision
# features indices for weight loading
VGG16_CONVS = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
_TORCHVISION_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
# taps after these conv indices (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
_TAPS = (1, 3, 6, 9, 12)

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def init_vgg16(rng: jax.Array, cache_dir: Optional[str] = "model/vgg16") -> Dict[str, Any]:
    """Deterministic random init, overwritten by torchvision weights if a
    checkpoint file is found under cache_dir."""
    params = {"w": [], "b": []}
    c_in = 3
    for i, (c_out, _) in enumerate(VGG16_CONVS):
        rng, k = jax.random.split(rng)
        fan = 3 * 3 * c_in
        params["w"].append(
            jax.random.normal(k, (3, 3, c_in, c_out)) * np.sqrt(2.0 / fan)
        )
        params["b"].append(jnp.zeros((c_out,)))
        c_in = c_out
    if cache_dir and os.path.isdir(cache_dir):
        from dreammat_tpu.models.diffusion import convert

        ckpt = convert.find_checkpoint_file(cache_dir)
        if ckpt:
            sd = convert.load_torch_state_dict(ckpt)
            loaded = 0
            for i, ti in enumerate(_TORCHVISION_IDX):
                wk, bk = f"features.{ti}.weight", f"features.{ti}.bias"
                if wk in sd:
                    params["w"][i] = jnp.asarray(
                        np.transpose(sd[wk], (2, 3, 1, 0))
                    )
                    params["b"][i] = jnp.asarray(sd[bk])
                    loaded += 1
            dreammat_tpu.info("loaded %d/%d VGG16 convs from %s", loaded,
                              len(VGG16_CONVS), ckpt)
    return params


def _features(params, x):
    """x [B,H,W,3] in [0,1] -> list of tap activations."""
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    h = (x - mean) / std
    taps = []
    for i, (c_out, pool) in enumerate(VGG16_CONVS):
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        h = jax.lax.conv_general_dilated(
            h, params["w"][i], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["b"][i]
        h = jax.nn.relu(h)
        if i in _TAPS:
            taps.append(h)
    return taps


def perceptual_distance(params, x, y) -> jnp.ndarray:
    """LPIPS-style distance: unit-normalize each tap along channels, mean
    squared difference, summed over taps. x, y: [B,H,W,3] in [0,1]."""
    fx = _features(params, x)
    fy = _features(params, y)
    total = 0.0
    for a, b in zip(fx, fy):
        a = a * jax.lax.rsqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        b = b * jax.lax.rsqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        total = total + jnp.mean(jnp.sum((a - b) ** 2, axis=-1))
    return total
