"""T5 text encoder (encoder-only stack) in Flax.

From-scratch equivalent of the ``T5EncoderModel`` DeepFloyd-IF conditions
on (/root/reference/threestudio_dreammat/threestudio/models/
prompt_processors/deepfloyd_prompt_processor.py:31-48 loads
``DeepFloyd/IF-I-XL-v1.0`` text_encoder, a T5-v1.1-XXL encoder):

- RMSNorm (no bias, no mean subtraction), pre-norm residual blocks,
- self-attention with *relative position bias* (32 buckets, bidirectional,
  max distance 128) computed once in the first block and shared,
- gated-GELU feed-forward (wi_0 * gelu, wi_1 linear, wo out),
- NO absolute position embeddings, final RMSNorm.

Everything is matmul-dominated — ideal MXU work; the position-bias bucket
table is a tiny static [heads, 32] embedding gathered per (q, k) offset.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    max_length: int = 77

    @staticmethod
    def xxl() -> "T5Config":
        """T5-v1.1-XXL encoder — the DeepFloyd-IF text tower."""
        return T5Config()

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(
            vocab_size=512, d_model=64, d_kv=16, d_ff=128,
            num_layers=2, num_heads=4, max_length=16,
        )


def rms_norm(x, weight, eps=1e-6):
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def relative_position_bucket(rel, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucketing (HF _relative_position_bucket)."""
    num_buckets //= 2
    ret = (rel > 0).astype(np.int64) * num_buckets
    n = np.abs(rel)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


class T5Attention(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        c = self.cfg
        B, N, _ = x.shape
        inner = c.num_heads * c.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(B, N, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        # T5 does NOT scale by sqrt(d_kv) — the init folds it in
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        scores = scores + position_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return nn.Dense(c.d_model, use_bias=False, dtype=self.dtype, name="o")(out)


class T5Block(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        c = self.cfg
        w1 = self.param("attn_layer_norm", nn.initializers.ones, (c.d_model,))
        h = rms_norm(x, w1)
        x = x + T5Attention(c, dtype=self.dtype, name="attention")(h, position_bias)
        w2 = self.param("ff_layer_norm", nn.initializers.ones, (c.d_model,))
        h = rms_norm(x, w2)
        g = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
        lin = nn.Dense(c.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        h = nn.gelu(g, approximate=True) * lin
        x = x + nn.Dense(c.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x


class T5Encoder(nn.Module):
    cfg: T5Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids [B, N] -> last_hidden_state [B, N, d_model]."""
        c = self.cfg
        N = input_ids.shape[1]
        x = nn.Embed(
            c.vocab_size, c.d_model, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        # shared relative position bias: static bucket table for length N
        pos = np.arange(N)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            c.relative_attention_num_buckets,
            c.relative_attention_max_distance,
        )  # [N, N]
        bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(0.02),
            (c.relative_attention_num_buckets, c.num_heads),
        )
        position_bias = bias_table[jnp.asarray(buckets)]  # [N, N, H]
        position_bias = position_bias.transpose(2, 0, 1)[None].astype(jnp.float32)
        for i in range(c.num_layers):
            x = T5Block(c, dtype=self.dtype, name=f"block_{i}")(x, position_bias)
        w = self.param("final_layer_norm", nn.initializers.ones, (c.d_model,))
        return rms_norm(x, w).astype(jnp.float32)
