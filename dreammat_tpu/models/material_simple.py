"""Simple per-sample materials for volume rendering systems.

TPU-native rebuilds of the reference's non-PBR materials:

- ``diffuse-with-point-light-material``
  (/root/reference/threestudio_dreammat/threestudio/models/materials/
  diffuse_with_point_light_material.py:14-120): lambert shading from a
  point light at the camera with albedo / textureless / diffuse shading
  augmentation. The reference picks the augmentation with python
  ``random.random()`` per step; here the choice is a traced ``lax.switch``
  on an int sampled from the step rng so the whole render stays inside one
  jit (no per-step recompiles, identical distribution).

- ``no-material``
  (.../materials/no_material.py): features pass through an activation,
  optionally already in latent space (latent-NeRF style systems).

Materials are pure functions: ``__call__(features, positions,
shading_normal, light_positions, rng, step, is_train)`` -> rgb per sample.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.utils.base import BaseObject
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("diffuse-with-point-light-material")
class DiffuseWithPointLightMaterial(BaseObject):
    @dataclass
    class Config:
        ambient_light_color: Tuple[float, float, float] = (0.1, 0.1, 0.1)
        diffuse_light_color: Tuple[float, float, float] = (0.9, 0.9, 0.9)
        ambient_only_steps: int = 1000
        diffuse_prob: float = 0.75
        textureless_prob: float = 0.5
        albedo_activation: str = "sigmoid"
        soft_shading: bool = False

    cfg: Config
    requires_normal: bool = True

    def configure(self) -> None:
        self.ambient = jnp.asarray(self.cfg.ambient_light_color, jnp.float32)
        self.diffuse = jnp.asarray(self.cfg.diffuse_light_color, jnp.float32)

    def _albedo(self, features):
        act = self.cfg.albedo_activation
        if act == "sigmoid":
            return jax.nn.sigmoid(features[..., :3])
        if act == "scale_-11_01":
            return features[..., :3] * 0.5 + 0.5
        if act == "none":
            return features[..., :3]
        raise ValueError(f"unknown albedo activation {act}")

    def __call__(
        self,
        features: jnp.ndarray,        # [..., Nf]
        positions: jnp.ndarray,       # [..., 3]
        shading_normal: jnp.ndarray,  # [..., 3]
        light_positions: jnp.ndarray, # [..., 3] (broadcast per sample)
        rng: Optional[jax.Array] = None,
        step=0,
        is_train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        albedo = self._albedo(features)

        k_soft, k_shading = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        if is_train and cfg.soft_shading and k_soft is not None:
            # random ambient ratio per step (reference :63-68)
            d = jax.random.uniform(k_soft, ())
            diffuse_color = jnp.full((3,), d)
            ambient_color = 1.0 - diffuse_color
        else:
            diffuse_color = self.diffuse
            ambient_color = self.ambient

        ldir = light_positions - positions
        ldir = ldir / (jnp.linalg.norm(ldir, axis=-1, keepdims=True) + 1e-8)
        ndotl = jnp.clip(jnp.sum(shading_normal * ldir, axis=-1, keepdims=True), 0.0, None)
        textureless = ndotl * diffuse_color + ambient_color
        shaded = jnp.clip(albedo, 0.0, 1.0) * textureless

        if not is_train:
            # eval: diffuse unless still in the ambient-only window (:93-98)
            return jnp.where(jnp.asarray(step) < cfg.ambient_only_steps, albedo, shaded)

        # training augmentation (reference :84-92): ambient-only window
        # forces albedo; otherwise P(albedo) = 1-diffuse_prob, then
        # P(textureless | not albedo) = textureless_prob
        u = jax.random.uniform(k_shading, (2,)) if k_shading is not None else jnp.zeros(2)
        mode = jnp.where(
            u[0] > cfg.diffuse_prob, 0,                      # albedo
            jnp.where(u[1] < cfg.textureless_prob, 1, 2),    # textureless | diffuse
        )
        mode = jnp.where(jnp.asarray(step) < cfg.ambient_only_steps, 0, mode)
        branches = [lambda: albedo, lambda: jnp.broadcast_to(textureless, shaded.shape),
                    lambda: shaded]
        return jax.lax.switch(mode, branches)

    def export(self, features: jnp.ndarray):
        return {"albedo": jnp.clip(self._albedo(features), 0.0, 1.0)}


@dreammat_tpu.register("no-material")
class NoMaterial(BaseObject):
    @dataclass
    class Config:
        n_output_dims: int = 3
        color_activation: str = "sigmoid"

    cfg: Config
    requires_normal: bool = False

    def configure(self) -> None:
        pass

    def __call__(self, features, positions=None, shading_normal=None,
                 light_positions=None, rng=None, step=0, is_train=False):
        f = features[..., : self.cfg.n_output_dims]
        act = self.cfg.color_activation
        if act == "sigmoid":
            return jax.nn.sigmoid(f)
        if act == "scale_-11_01":
            return f * 0.5 + 0.5
        if act == "none":
            return f
        raise ValueError(f"unknown color activation {act}")

    def export(self, features: jnp.ndarray):
        return {"albedo": jnp.clip(self(features), 0.0, 1.0)}
