"""CLIP vision tower (image embedder) in Flax.

From-scratch equivalent of the ``FrozenCLIPImageEmbedder`` Zero123
conditions on (/root/reference/threestudio_dreammat/threestudio/models/
guidance/zero123_guidance.py:175-181 via ``model.get_learned_conditioning``
— the LDM config points it at CLIP ViT-L/14): conv patch embedding + class
token + pre-LN transformer + final LN + linear projection of the class
token. Output is the single [B, 1, projection_dim] conditioning token the
cc_projection consumes.

Pre-LN blocks mirror ``clip_text.CLIPTextLayer`` but without the causal
mask (images attend bidirectionally).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    projection_dim: int = 768

    @staticmethod
    def vit_l14() -> "CLIPVisionConfig":
        """ViT-L/14, the tower Zero123's image conditioning uses."""
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=64,
            intermediate_size=128, num_layers=2, num_heads=4,
            projection_dim=64,
        )


class CLIPVisionLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
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
        attn = jax.nn.dot_product_attention(q, k, v)
        attn = attn.reshape(B, N, c.hidden_size)
        x = x + nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPVisionModel(nn.Module):
    """[B, S, S, 3] image in [0, 1] -> [B, 1, projection_dim] embedding."""

    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B = images.shape[0]
        # CLIP preprocessing: per-channel normalization (the public
        # OpenAI/OpenCLIP constants)
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        x = (images - mean) / std
        if x.shape[1] != c.image_size:
            x = jax.image.resize(
                x, (B, c.image_size, c.image_size, 3), method="linear"
            )
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(x.astype(self.dtype))
        n = (c.image_size // c.patch_size) ** 2
        x = x.reshape(B, n, c.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, c.hidden_size)), x],
            axis=1,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (n + 1, c.hidden_size),
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layernorm")(x)
        for i in range(c.num_layers):
            x = CLIPVisionLayer(c, dtype=self.dtype, name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_layernorm")(x)
        pooled = x[:, 0]
        proj = nn.Dense(
            c.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
        return proj[:, None, :].astype(jnp.float32)
