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
        self.color = jnp.asarray(self.cfg.color, dtype=jnp.float32)

    def init(self, rng: jax.Array):
        if self.cfg.learned:
            return {"color": self.color}
        return {}

    def __call__(self, dirs: jnp.ndarray, params: Optional[Dict] = None) -> jnp.ndarray:
        color = params["color"] if params else self.color
        return jnp.broadcast_to(color, (*dirs.shape[:-1], self.cfg.n_output_dims))


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
