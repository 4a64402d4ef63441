"""UNet2DCondition (SD 2.1-base architecture) in Flax, NHWC.

From-scratch equivalent of ``diffusers.UNet2DConditionModel`` as consumed by
the reference guidance (/root/reference/threestudio_dreammat/threestudio/
models/guidance/dreammat_guidance.py:262-282), including the
``down_block_additional_residuals`` / ``mid_block_additional_residual``
ControlNet injection points. Sizes are configurable so tests can run a tiny
variant; ``UNetConfig.sd21()`` reproduces the SD2.1-base layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dreammat_tpu.models.diffusion import layers as L


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # per-down-block: True => cross-attn transformer after each resnet
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    attention_head_dim: int = 64
    cross_attention_dim: int = 1024
    transformer_depth: int = 1
    use_linear_projection: bool = True
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True

    @staticmethod
    def sd21() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def tiny() -> "UNetConfig":
        # cross_attention_dim matches CLIPTextConfig.tiny().hidden_size
        return UNetConfig(
            block_out_channels=(32, 64),
            down_block_has_attn=(True, False),
            attention_head_dim=8,
            cross_attention_dim=64,
            layers_per_block=1,
        )


class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_attn: bool
    add_downsample: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        outputs = []
        for i in range(self.cfg.layers_per_block):
            x = L.ResnetBlock(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if self.has_attn:
                heads = self.out_channels // self.cfg.attention_head_dim
                x = L.Transformer2D(
                    heads, self.cfg.attention_head_dim, self.cfg.transformer_depth,
                    self.cfg.cross_attention_dim, self.cfg.use_linear_projection,
                    dtype=self.dtype, name=f"attentions_{i}",
                )(x, context)
            outputs.append(x)
        if self.add_downsample:
            x = L.Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            outputs.append(x)
        return x, outputs


class CrossAttnUpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_attn: bool
    add_upsample: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = L.ResnetBlock(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if self.has_attn:
                heads = self.out_channels // self.cfg.attention_head_dim
                x = L.Transformer2D(
                    heads, self.cfg.attention_head_dim, self.cfg.transformer_depth,
                    self.cfg.cross_attention_dim, self.cfg.use_linear_projection,
                    dtype=self.dtype, name=f"attentions_{i}",
                )(x, context)
        if self.add_upsample:
            x = L.Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class MidBlock(nn.Module):
    cfg: UNetConfig
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        x = L.ResnetBlock(self.channels, dtype=self.dtype, name="resnets_0")(x, temb)
        heads = self.channels // self.cfg.attention_head_dim
        x = L.Transformer2D(
            heads, self.cfg.attention_head_dim, self.cfg.transformer_depth,
            self.cfg.cross_attention_dim, self.cfg.use_linear_projection,
            dtype=self.dtype, name="attentions_0",
        )(x, context)
        x = L.ResnetBlock(self.channels, dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class UNet2DCondition(nn.Module):
    """sample [B,H,W,C_in], timesteps [B], context [B,N,cross_dim] -> eps."""

    cfg: UNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray,
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        class_labels: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb = L.timestep_embedding(
            timesteps, ch0, flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        temb = L.TimestepEmbedding(ch0 * 4, dtype=self.dtype, name="time_embedding")(temb)
        if class_labels is not None:
            # camera-conditioned class embedding (diffusers class_embedding
            # slot; VSD guidance feeds a flattened c2w — reference
            # stable_diffusion_vsd_guidance.py:154-158). Params are created
            # lazily, so checkpoints without it stay compatible.
            temb = temb + L.TimestepEmbedding(
                ch0 * 4, dtype=self.dtype, name="class_embedding"
            )(class_labels.astype(self.dtype))

        x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))
        skips = [x]
        for b, out_ch in enumerate(cfg.block_out_channels):
            last = b == len(cfg.block_out_channels) - 1
            x, outs = CrossAttnDownBlock(
                cfg, out_ch, cfg.down_block_has_attn[b], add_downsample=not last,
                dtype=self.dtype, name=f"down_blocks_{b}",
            )(x, temb, context)
            skips.extend(outs)

        x = MidBlock(cfg, cfg.block_out_channels[-1], dtype=self.dtype, name="mid_block")(
            x, temb, context
        )

        if down_block_additional_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_additional_residuals)]
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual

        rev_ch = list(reversed(cfg.block_out_channels))
        rev_attn = list(reversed(cfg.down_block_has_attn))
        for b, out_ch in enumerate(rev_ch):
            last = b == len(rev_ch) - 1
            x = CrossAttnUpBlock(
                cfg, out_ch, rev_attn[b], add_upsample=not last,
                dtype=self.dtype, name=f"up_blocks_{b}",
            )(x, skips, temb, context)

        x = nn.GroupNorm(32, epsilon=1e-5, dtype=L.norm_dtype(self.dtype), name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv_out",
        )(x)
        return x.astype(jnp.float32)
