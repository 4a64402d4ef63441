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
        viewdirs: Optional[jnp.ndarray] = None,
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
                 light_positions=None, viewdirs=None, rng=None, step=0,
                 is_train=False):
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


@dreammat_tpu.register("hybrid-rgb-latent-material")
class HybridRGBLatentMaterial(BaseObject):
    """First 3 feature channels through the color activation, the rest
    passed through raw (.../materials/hybrid_rgb_latent_material.py:16-36
    — RGB head + SD-latent tail rendered side by side)."""

    @dataclass
    class Config:
        n_output_dims: int = 7
        color_activation: str = "sigmoid"
        requires_normal: bool = True

    cfg: Config

    def configure(self) -> None:
        self.requires_normal = self.cfg.requires_normal

    def __call__(self, features, positions=None, shading_normal=None,
                 light_positions=None, viewdirs=None, rng=None, step=0,
                 is_train=False):
        f = features[..., : self.cfg.n_output_dims]
        act = self.cfg.color_activation
        if act == "sigmoid":
            rgb = jax.nn.sigmoid(f[..., :3])
        elif act == "scale_-11_01":
            rgb = f[..., :3] * 0.5 + 0.5
        elif act == "none":
            rgb = f[..., :3]
        else:
            raise ValueError(f"unknown color activation {act}")
        return jnp.concatenate([rgb, f[..., 3:]], axis=-1)

    def export(self, features: jnp.ndarray):
        return {"albedo": jnp.clip(self(features)[..., :3], 0.0, 1.0)}


# Fixed 4x3 linear map from SD latents to approximate RGB; the well-known
# public decoder approximation the reference initializes from
# (.../materials/sd_latent_adapter_material.py:22-33).
SD_LATENT_RGB_ADAPTER = (
    (0.298, 0.207, 0.208),
    (0.187, 0.286, 0.173),
    (-0.158, 0.189, 0.264),
    (-0.184, -0.271, -0.473),
)


@dreammat_tpu.register("sd-latent-adapter-material")
class SDLatentAdapterMaterial(BaseObject):
    """Linear 4->3 adapter approximating the SD VAE decode
    (.../materials/sd_latent_adapter_material.py:14-42).

    The reference makes the matrix a trained nn.Parameter; here it is a
    fixed constant by default — materials are pure functions in this
    framework and no supported system threads material params through the
    optimizer. The constant is the published init, which is also what the
    reference effectively uses for most of training.
    """

    @dataclass
    class Config:
        pass

    cfg: Config
    requires_normal: bool = False

    def configure(self) -> None:
        self.adapter = jnp.asarray(SD_LATENT_RGB_ADAPTER, jnp.float32)

    def __call__(self, features, positions=None, shading_normal=None,
                 light_positions=None, viewdirs=None, rng=None, step=0,
                 is_train=False):
        color = features[..., :4] @ self.adapter
        return jnp.clip((color + 1.0) / 2.0, 0.0, 1.0)

    def export(self, features: jnp.ndarray):
        return {"albedo": self(features)}


@dreammat_tpu.register("neural-radiance-material")
class NeuralRadianceMaterial(BaseObject):
    """View-dependent radiance head: MLP(features, SH(viewdirs)) -> rgb
    (.../materials/neural_radiance_material.py:16-54).

    The reference uses tcnn SphericalHarmonics + FullyFusedMLP; here the
    SH basis is evaluated in closed form (degree <= 4) and the MLP is the
    framework's dense `ops.mlp` (MXU matmuls). Weights live in a pytree
    created by ``init`` and carried by the system like background params —
    but since no supported system trains material params, they default to
    a fixed random init owned by the material (deterministic seed).
    """

    @dataclass
    class Config:
        input_feature_dims: int = 8
        color_activation: str = "sigmoid"
        sh_degree: int = 3
        n_neurons: int = 16
        n_hidden_layers: int = 2
        seed: int = 0

    cfg: Config
    requires_normal: bool = False

    def configure(self) -> None:
        from dreammat_tpu.ops.mlp import init_mlp, vanilla_mlp_dims

        self.n_sh = self.cfg.sh_degree ** 2
        self.params = init_mlp(
            jax.random.PRNGKey(self.cfg.seed),
            vanilla_mlp_dims(
                self.cfg.input_feature_dims + self.n_sh, 3,
                n_neurons=self.cfg.n_neurons,
                n_hidden_layers=self.cfg.n_hidden_layers,
            ),
        )

    @staticmethod
    def _sh_basis(d: jnp.ndarray, degree: int) -> jnp.ndarray:
        """Real SH basis up to degree 4 on unit dirs, [..., degree^2]."""
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        out = [jnp.full_like(x, 0.28209479177387814)]
        if degree > 1:
            out += [-0.48860251190291987 * y, 0.48860251190291987 * z,
                    -0.48860251190291987 * x]
        if degree > 2:
            xy, yz, xz = x * y, y * z, x * z
            x2, y2, z2 = x * x, y * y, z * z
            out += [
                1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.31539156525252005 * (3.0 * z2 - 1.0),
                -1.0925484305920792 * xz,
                0.5462742152960396 * (x2 - y2),
            ]
        if degree > 3:
            out += [
                -0.5900435899266435 * y * (3 * x2 - y2),
                2.890611442640554 * xy * z,
                -0.4570457994644658 * y * (5 * z2 - 1),
                0.3731763325901154 * z * (5 * z2 - 3),
                -0.4570457994644658 * x * (5 * z2 - 1),
                1.445305721320277 * z * (x2 - y2),
                -0.5900435899266435 * x * (x2 - 3 * y2),
            ]
        return jnp.stack(out, axis=-1)

    def __call__(self, features, positions=None, shading_normal=None,
                 light_positions=None, viewdirs=None, rng=None, step=0,
                 is_train=False):
        if viewdirs is None:
            raise ValueError("neural-radiance-material needs viewdirs")
        from dreammat_tpu.ops.mlp import apply_mlp

        sh = self._sh_basis(viewdirs, self.cfg.sh_degree)
        inp = jnp.concatenate(
            [features[..., : self.cfg.input_feature_dims], sh], axis=-1
        )
        color = apply_mlp(self.params, inp)
        act = self.cfg.color_activation
        if act == "sigmoid":
            return jax.nn.sigmoid(color)
        if act == "none":
            return color
        raise ValueError(f"unknown color activation {act}")

    def export(self, features: jnp.ndarray):
        # radiance is view-dependent; export the view-from-+z slice
        z = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0]), features.shape[:-1] + (3,)
        )
        return {"albedo": jnp.clip(self(features, viewdirs=z), 0.0, 1.0)}
