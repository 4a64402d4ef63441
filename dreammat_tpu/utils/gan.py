"""GAN building blocks for the Control4D renderer (flax).

From-scratch equivalents of the reference's ``threestudio/utils/GAN``
toolbox (/root/reference/threestudio_dreammat/threestudio/utils/GAN/):

- ``Generator`` / ``LocalEncoder`` (vae.py): LDM-style conv resnet
  stacks; the generator upsamples the [lr_rgb, z] stack by
  ``2^(len(ch_mult)-1)`` and injects the global code as a learned affine
  on the mid features (the reference grafts the code into its modified
  VAE decoder; an additive FiLM at the bottleneck is the standard
  equivalent — documented substitution);
- ``GlobalEncoder`` (mobilenet.py MobileNetV3): a small strided convnet
  with the same contract (image -> n_class-dim code). MobileNet's exact
  topology is an ImageNet-era efficiency choice with no pretrained
  weights shipped; matched capacity, documented substitution;
- ``NLayerDiscriminator`` (discriminator.py): the pix2pix PatchGAN;
- ``DiagonalGaussianDistribution`` (distribution.py) as pure functions;
- hinge generator/discriminator losses (loss.py:5-36).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _groups(c: int) -> int:
    """Largest power-of-two divisor of c, capped at 32 (GroupNorm needs
    groups | channels)."""
    for g in (32, 16, 8, 4, 2):
        if c % g == 0:
            return g
    return 1


class ResBlock(nn.Module):
    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(_groups(x.shape[-1]), dtype=jnp.float32)(x)
        h = nn.swish(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.GroupNorm(_groups(self.ch), dtype=jnp.float32)(h)
        h = nn.swish(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype)(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=self.dtype)(x)
        return x + h


class LocalEncoder(nn.Module):
    """Image -> [H/2^(L-1), W/2^(L-1), 2*z_channels] moments."""

    ch: int = 32
    ch_mult: Sequence[int] = (1, 2, 4)
    z_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype)(x)
        for i, m in enumerate(self.ch_mult):
            h = ResBlock(self.ch * m, dtype=self.dtype)(h)
            if i != len(self.ch_mult) - 1:
                h = nn.Conv(self.ch * m, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype)(h)
        h = ResBlock(self.ch * self.ch_mult[-1], dtype=self.dtype)(h)
        return nn.Conv(2 * self.z_channels, (3, 3), padding=1,
                       dtype=self.dtype)(h)


class Generator(nn.Module):
    """[lr_rgb ++ z] at low res + global code -> full-res RGB."""

    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4)
    out_ch: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, g_code):
        mults = list(reversed(self.ch_mult))
        h = nn.Conv(self.ch * mults[0], (3, 3), padding=1, dtype=self.dtype)(x)
        # global-code FiLM at the bottleneck
        scale = nn.Dense(self.ch * mults[0], dtype=self.dtype)(g_code)
        shift = nn.Dense(self.ch * mults[0], dtype=self.dtype)(g_code)
        h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        for i, m in enumerate(mults):
            h = ResBlock(self.ch * m, dtype=self.dtype)(h)
            if i != len(mults) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype)(h)
        h = nn.GroupNorm(_groups(h.shape[-1]), dtype=jnp.float32)(h)
        h = nn.swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype)(h)


class GlobalEncoder(nn.Module):
    """Image -> n_class-dim global appearance code."""

    n_class: int = 64
    ch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(4):
            h = nn.Conv(self.ch * (2 ** i), (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype)(h)
            h = nn.swish(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.n_class, dtype=self.dtype)(h)


class NLayerDiscriminator(nn.Module):
    """pix2pix PatchGAN (discriminator.py NLayerDiscriminator)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(self.ndf * mult, (4, 4), strides=(stride, stride),
                        padding=1, use_bias=False, dtype=self.dtype)(h)
            h = nn.GroupNorm(_groups(self.ndf * mult), dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1,
                       dtype=self.dtype)(h)


# -- diagonal gaussian (distribution.py) -------------------------------------

def gaussian_moments(latent: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mean, logvar = jnp.split(latent, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def gaussian_sample(latent, rng):
    mean, logvar = gaussian_moments(latent)
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)


def gaussian_kl(latent) -> jnp.ndarray:
    mean, logvar = gaussian_moments(latent)
    return 0.5 * jnp.mean(
        jnp.sum(mean ** 2 + jnp.exp(logvar) - 1.0 - logvar, axis=-1)
    )


# -- hinge losses (loss.py:5-36) ---------------------------------------------

def generator_loss(disc_apply, disc_params, fake) -> jnp.ndarray:
    return -jnp.mean(disc_apply(disc_params, fake))


def discriminator_loss(disc_apply, disc_params, real, fake) -> jnp.ndarray:
    lr = disc_apply(disc_params, jax.lax.stop_gradient(real))
    lf = disc_apply(disc_params, jax.lax.stop_gradient(fake))
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - lr)) + jnp.mean(jax.nn.relu(1.0 + lf))
    )
