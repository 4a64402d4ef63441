"""AutoencoderKL (SD VAE) in Flax, NHWC.

From-scratch equivalent of ``diffusers.AutoencoderKL`` as used by the
reference guidance for latent encode/decode
(/root/reference/threestudio_dreammat/threestudio/models/guidance/
dreammat_guidance.py:284-308). scaling_factor 0.18215 as in SD2.1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dreammat_tpu.models.diffusion import layers as L


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215

    @staticmethod
    def sd() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(32, 64), layers_per_block=1)


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for b, ch in enumerate(cfg.block_out_channels):
            for i in range(cfg.layers_per_block):
                h = L.ResnetBlock(ch, dtype=self.dtype, name=f"down_blocks_{b}_resnets_{i}")(h, None)
            if b != len(cfg.block_out_channels) - 1:
                h = L.Downsample(ch, dtype=self.dtype, name=f"down_blocks_{b}_downsamplers_0")(h)
        ch = cfg.block_out_channels[-1]
        h = L.ResnetBlock(ch, dtype=self.dtype, name="mid_block_resnets_0")(h, None)
        h = L.SelfAttention2D(dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = L.ResnetBlock(ch, dtype=self.dtype, name="mid_block_resnets_1")(h, None)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=L.norm_dtype(self.dtype), name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = L.ResnetBlock(ch, dtype=self.dtype, name="mid_block_resnets_0")(h, None)
        h = L.SelfAttention2D(dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = L.ResnetBlock(ch, dtype=self.dtype, name="mid_block_resnets_1")(h, None)
        rev = list(reversed(cfg.block_out_channels))
        for b, ch in enumerate(rev):
            for i in range(cfg.layers_per_block + 1):
                h = L.ResnetBlock(ch, dtype=self.dtype, name=f"up_blocks_{b}_resnets_{i}")(h, None)
            if b != len(rev) - 1:
                h = L.Upsample(ch, dtype=self.dtype, name=f"up_blocks_{b}_upsamplers_0")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=L.norm_dtype(self.dtype), name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        """x in [-1,1], NHWC -> (mean, logvar) of the latent posterior."""
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None):
        """Sample (or take the mean of) the scaled latent."""
        mean, logvar = self.encode_moments(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return mean * self.cfg.scaling_factor

    def decode(self, z):
        z = z / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z)
