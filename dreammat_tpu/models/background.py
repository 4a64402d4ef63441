"""Backgrounds (reference models/background/*).

Only the solid-color background sits on the DreamMat path
(/root/reference/threestudio_dreammat/threestudio/models/background/
solid_color_background.py:13-51); the neural-envmap variant is provided as a
small learnable extension point.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.ops import mlp as mlp_lib
from dreammat_tpu.ops.hashgrid import frequency_encode, frequency_encoding_dims
from dreammat_tpu.utils.base import BaseObject


@dreammat_tpu.register("solid-color-background")
class SolidColorBackground(BaseObject):
    @dataclass
    class Config:
        n_output_dims: int = 3
        color: Tuple = (1.0, 1.0, 1.0)
        learned: bool = False

    cfg: Config

    def configure(self) -> None:
        import numpy as np

        # tile/truncate the configured color to n_output_dims so latent-space
        # systems (4-ch) can keep the default (1,1,1) config
        self.color = jnp.asarray(
            np.resize(np.asarray(self.cfg.color, np.float32),
                      self.cfg.n_output_dims)
        )

    def init(self, rng: jax.Array):
        if self.cfg.learned:
            return {"color": self.color}
        return {}

    def __call__(self, dirs: jnp.ndarray, params: Optional[Dict] = None) -> jnp.ndarray:
        color = params["color"] if params else self.color
        return jnp.broadcast_to(color, (*dirs.shape[:-1], self.cfg.n_output_dims))


@dreammat_tpu.register("textured-background")
class TexturedBackground(BaseObject):
    """Learnable equirect texture background (reference
    models/background/textured_background.py:14-54): dirs -> spherical
    (u, v) -> bilinear fetch from a trainable [H, W, C] texture ->
    activation. The reference's grid_sample reflection padding is replaced
    by u-clamp + v-wrap, the natural boundary for an equirect chart."""

    @dataclass
    class Config:
        n_output_dims: int = 3
        height: int = 64
        width: int = 64
        color_activation: str = "sigmoid"

    cfg: Config

    def configure(self) -> None:
        pass

    def init(self, rng: jax.Array):
        return {
            "texture": jax.random.normal(
                rng, (self.cfg.height, self.cfg.width, self.cfg.n_output_dims)
            )
        }

    def __call__(self, dirs: jnp.ndarray, params: Optional[Dict] = None) -> jnp.ndarray:
        from dreammat_tpu.utils.ops import get_activation

        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        xy = jnp.sqrt(x * x + y * y)
        u = jnp.arctan2(xy, z) / jnp.pi                   # [0, 1] polar
        v = jnp.arctan2(y, x) / (2.0 * jnp.pi) + 0.5     # [0, 1] azimuth
        H, W = self.cfg.height, self.cfg.width
        tex = params["texture"]
        uf = jnp.clip(u * H - 0.5, 0.0, H - 1.0)
        vf = v * W - 0.5
        u0 = jnp.floor(uf).astype(jnp.int32)
        v0 = jnp.floor(vf).astype(jnp.int32)
        wu = (uf - u0)[..., None]
        wv = (vf - v0)[..., None]
        u1 = jnp.clip(u0 + 1, 0, H - 1)
        u0 = jnp.clip(u0, 0, H - 1)
        v1 = (v0 + 1) % W
        v0 = v0 % W
        out = (
            tex[u0, v0] * (1 - wu) * (1 - wv)
            + tex[u1, v0] * wu * (1 - wv)
            + tex[u0, v1] * (1 - wu) * wv
            + tex[u1, v1] * wu * wv
        )
        return get_activation(self.cfg.color_activation)(out)


@dreammat_tpu.register("neural-environment-map-background")
class NeuralEnvironmentMapBackground(BaseObject):
    """Direction-conditioned MLP background (reference
    models/background/neural_environment_map_background.py semantics)."""

    @dataclass
    class Config:
        n_output_dims: int = 3
        color_activation: str = "sigmoid"
        dir_encoding_frequencies: int = 4
        mlp_n_neurons: int = 16
        mlp_n_hidden_layers: int = 2

    cfg: Config

    def configure(self) -> None:
        self.in_dim = frequency_encoding_dims(3, self.cfg.dir_encoding_frequencies)
        self.dims = [self.in_dim] + [self.cfg.mlp_n_neurons] * self.cfg.mlp_n_hidden_layers + [
            self.cfg.n_output_dims
        ]

    def init(self, rng: jax.Array):
        return {"mlp": mlp_lib.init_mlp(rng, self.dims)}

    def __call__(self, dirs: jnp.ndarray, params: Optional[Dict] = None) -> jnp.ndarray:
        from dreammat_tpu.utils.ops import get_activation

        enc = frequency_encode(dirs, self.cfg.dir_encoding_frequencies)
        out = mlp_lib.apply_mlp(params["mlp"], enc)
        return get_activation(self.cfg.color_activation)(out)
