"""CLIP text encoder (OpenCLIP ViT-H text tower, as in SD 2.1) in Flax.

From-scratch equivalent of the ``transformers.CLIPTextModel`` used by the
reference prompt processor (/root/reference/threestudio_dreammat/threestudio/
models/prompt_processors/stable_diffusion_prompt_processor.py:7,81):
token + position embeddings, pre-LN causal transformer, final LayerNorm.
SD2.1's shipped text encoder has 23 layers / 1024 width / 16 heads / GELU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23
    num_heads: int = 16
    max_length: int = 77

    @staticmethod
    def sd21() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=1024, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, max_length=16,
        )


class CLIPTextLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x)
        B, N, _ = h.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(B, N, c.num_heads, head_dim)
        k = k.reshape(B, N, c.num_heads, head_dim)
        v = v.reshape(B, N, c.num_heads, head_dim)
        attn = jax.nn.dot_product_attention(q, k, v, is_causal=True)
        attn = attn.reshape(B, N, c.hidden_size)
        x = x + nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids [B,N] -> last_hidden_state [B,N,hidden]."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_length, c.hidden_size),
        )
        x = tok + pos[None, : input_ids.shape[1]].astype(self.dtype)
        for i in range(c.num_layers):
            x = CLIPTextLayer(c, dtype=self.dtype, name=f"layers_{i}")(x, None)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x)
