"""Shared diffusion building blocks (Flax).

From-scratch TPU implementations of the blocks Stable Diffusion 2.1 is made
of (the reference consumes them via HuggingFace diffusers,
/root/reference/threestudio_dreammat/threestudio/models/guidance/
dreammat_guidance.py:11-19). Layout is NHWC (TPU-native; torch weights are
transposed by models/diffusion/convert.py). Attention uses
``jax.nn.dot_product_attention`` which lowers to fused attention on TPU;
softmax runs in fp32 (SD2.x upcast_attention) while matmuls run in the
module dtype (bf16 by default on TPU).
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _ablated(tag: str) -> bool:
    """True when ``tag`` is listed in DREAMMAT_ABLATE (comma-separated).

    Ablation support for tools/profile_ablate.py: a listed subsystem is
    replaced by identity AT TRACE TIME, so timing the model with and
    without it attributes wall-clock to that subsystem (XLA dead-code
    eliminates everything only the ablated op consumed, e.g. its QKV
    projections). Never set during training — this changes the math.
    Tags: selfattn, crossattn, ff, tx, norm, resconv."""
    flags = os.environ.get("DREAMMAT_ABLATE")
    return bool(flags) and tag in flags.split(",")


def norm_dtype(module_dtype: Dtype) -> Dtype:
    """Output dtype for GroupNorm/LayerNorm: the module dtype.

    flax computes the normalization statistics in float32 regardless of
    ``dtype`` (linen promotes mean/var for stability), so the only thing a
    float32 ``dtype`` adds in a bf16 model is a float32 OUTPUT tensor —
    doubling every norm's HBM write + the next op's read on the
    bandwidth-bound 64^2 UNet levels. DREAMMAT_NORM=f32 restores the old
    full-f32 outputs for A/B."""
    if os.environ.get("DREAMMAT_NORM") == "f32":
        return jnp.float32
    return module_dtype


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers convention."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        in_ch = x.shape[-1]
        if _ablated("resconv"):
            if in_ch != self.out_channels:
                x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
            return x
        h = x if _ablated("norm") else nn.GroupNorm(32, epsilon=1e-5, dtype=norm_dtype(self.dtype), name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        if not _ablated("norm"):
            h = nn.GroupNorm(32, epsilon=1e-5, dtype=norm_dtype(self.dtype), name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention (self if context is None)."""

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32
    out_bias: bool = True

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.num_heads * self.head_dim
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, Nq = q.shape[0], q.shape[1]
        Nk = k.shape[1]
        q = q.reshape(B, Nq, self.num_heads, self.head_dim)
        k = k.reshape(B, Nk, self.num_heads, self.head_dim)
        v = v.reshape(B, Nk, self.num_heads, self.head_dim)
        from dreammat_tpu.ops.attention import attention as fused_attention

        out = fused_attention(q, k, v)  # Pallas flash kernel on TPU
        out = out.reshape(B, Nq, inner)
        return nn.Dense(inner, use_bias=self.out_bias, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward, 4x expansion (diffusers FeedForward)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    cross_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        def _ln(name, y):
            if _ablated("norm"):
                return y
            return nn.LayerNorm(epsilon=1e-5, dtype=norm_dtype(self.dtype), name=name)(y)

        if not _ablated("selfattn"):
            h = _ln("norm1", x)
            x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype, name="attn1")(h)
        if not _ablated("crossattn"):
            h = _ln("norm2", x)
            x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype, name="attn2")(h, context)
        if not _ablated("ff"):
            h = _ln("norm3", x)
            x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> (linear|conv) proj -> blocks -> proj out."""

    num_heads: int
    head_dim: int
    depth: int
    cross_dim: int
    use_linear_projection: bool = True  # SD2.x
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        if _ablated("tx"):
            return x
        B, H, W, C = x.shape
        residual = x
        h = x if _ablated("norm") else nn.GroupNorm(32, epsilon=1e-6, dtype=norm_dtype(self.dtype), name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(B, H * W, C)
            h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                C, self.num_heads, self.head_dim, self.cross_dim,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(h, context)
        if self.use_linear_projection:
            h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, C)
        else:
            h = h.reshape(B, H, W, C)
            h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class Downsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class SelfAttention2D(nn.Module):
    """VAE-style single-head spatial self attention."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=norm_dtype(self.dtype), name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(C, dtype=self.dtype, name="to_out_0")(out)
        return x + out.reshape(B, H, W, C)
