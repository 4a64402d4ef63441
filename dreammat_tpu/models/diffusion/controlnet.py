"""ControlNet (geometry- and light-aware, 22 conditioning channels) in Flax.

From-scratch equivalent of ``diffusers.ControlNetModel.from_unet(unet,
conditioning_channels=22)`` as trained by the reference
(/root/reference/controlnet_train/diffusers_train_controlnet.py:638) and
consumed at inference (threestudio/models/guidance/dreammat_guidance.py:
205-259): a copy of the UNet's down+mid path with a conditioning-embedding
stem and zero-initialized 1x1 output convs producing additive residuals.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dreammat_tpu.models.diffusion import layers as L
from dreammat_tpu.models.diffusion.unet import CrossAttnDownBlock, MidBlock, UNetConfig


@dataclass(frozen=True)
class ControlNetConfig:
    unet: UNetConfig = UNetConfig()
    conditioning_channels: int = 22
    conditioning_embedding_channels: Tuple[int, ...] = (16, 32, 96, 256)

    @staticmethod
    def dreammat() -> "ControlNetConfig":
        return ControlNetConfig()

    @staticmethod
    def tiny() -> "ControlNetConfig":
        return ControlNetConfig(
            unet=UNetConfig.tiny(), conditioning_embedding_channels=(16, 32)
        )


class ConditioningEmbedding(nn.Module):
    """Stem mapping the [B,H*8,W*8,C_cond] condition stack to latent res."""

    channels: Tuple[int, ...]
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cond):
        h = nn.Conv(self.channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.channels) - 1):
            h = nn.Conv(self.channels[i], (3, 3), padding=1, dtype=self.dtype, name=f"blocks_{2*i}")(h)
            h = nn.silu(h)
            h = nn.Conv(
                self.channels[i + 1], (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, name=f"blocks_{2*i+1}",
            )(h)
            h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv_out",
        )(h)
        return h


class ControlNet(nn.Module):
    """Returns (down_block_res_samples, mid_block_res_sample), already
    scaled by ``conditioning_scale``."""

    cfg: ControlNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,       # [B,h,w,4] noisy latents
        timesteps: jnp.ndarray,    # [B]
        context: jnp.ndarray,      # [B,N,cross]
        controlnet_cond: jnp.ndarray,  # [B or 1,H,W,C_cond] at image res
        conditioning_scale: float | jnp.ndarray = 1.0,
    ):
        # controlnet_cond may be batch-1 while sample is batch-B (CFG
        # replicas share one condition stack): the image-resolution stem —
        # the lowest-MFU convs in the denoise step — runs once and its
        # latent-res output broadcasts over the replicas in `x + cond`.
        ucfg = self.cfg.unet
        ch0 = ucfg.block_out_channels[0]
        temb = L.timestep_embedding(
            timesteps, ch0, flip_sin_to_cos=ucfg.flip_sin_to_cos,
            downscale_freq_shift=ucfg.freq_shift,
        ).astype(self.dtype)
        temb = L.TimestepEmbedding(ch0 * 4, dtype=self.dtype, name="time_embedding")(temb)

        x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            sample.astype(self.dtype)
        )
        cond = ConditioningEmbedding(
            self.cfg.conditioning_embedding_channels, ch0, dtype=self.dtype,
            name="controlnet_cond_embedding",
        )(controlnet_cond.astype(self.dtype))
        x = x + cond

        skips = [x]
        for b, out_ch in enumerate(ucfg.block_out_channels):
            last = b == len(ucfg.block_out_channels) - 1
            x, outs = CrossAttnDownBlock(
                ucfg, out_ch, ucfg.down_block_has_attn[b], add_downsample=not last,
                dtype=self.dtype, name=f"down_blocks_{b}",
            )(x, temb, context)
            skips.extend(outs)

        x = MidBlock(ucfg, ucfg.block_out_channels[-1], dtype=self.dtype, name="mid_block")(
            x, temb, context
        )

        down_res = []
        for i, s in enumerate(skips):
            z = nn.Conv(
                s.shape[-1], (1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name=f"controlnet_down_blocks_{i}",
            )(s)
            down_res.append(z * conditioning_scale)
        mid = nn.Conv(
            x.shape[-1], (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="controlnet_mid_block",
        )(x)
        return down_res, mid * conditioning_scale
