"""Fantasia3D system: geometry sculpting + texture painting via SDS over a
DMTet mesh.

TPU-native rebuild of ``fantasia3d-system``
(/root/reference/threestudio_dreammat/threestudio/systems/fantasia3d.py:
12-195):

- **geometry stage** (``texture=False``): the normal/silhouette image is
  the guidance input — first ``latent_steps`` steps feed
  ``[comp_normal*2-1, opacity]`` straight into latent space
  (``rgb_as_latents=True``, :51-57), then the normal image goes through
  the VAE like an RGB render (:58-62); plus the mesh normal-consistency
  regularizer (:64-68). Geometry gradients flow through the
  differentiable marching-tets chain (``ops/dmtet.py``) and the
  SDF-silhouette opacity (``mesh_rasterizer.py``).
- **texture stage** (``texture=True``): plain SDS on ``comp_rgb`` with
  geometry fixed (:69-82; the ControlNet-guidance variant maps to this
  framework's texcraft system, which owns live-condition guidance).

Both stages are one jitted train step each.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import optax

import dreammat_tpu
from dreammat_tpu.ops import dmtet
from dreammat_tpu.systems.dreamfusion import DreamFusion
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("fantasia3d-system")
class Fantasia3D(DreamFusion):
    @dataclass
    class Config(DreamFusion.Config):
        geometry_type: str = "tetrahedra-sdf-grid"
        renderer_type: str = "nvdiff-rasterizer"
        material_type: str = "no-material"
        background_type: str = "solid-color-background"
        latent_steps: int = 1000
        texture: bool = False
        loss: dict = field(default_factory=lambda: {
            "lambda_sds": 1.0,
            "lambda_normal_consistency": 10000.0,
        })

    cfg: Config

    def configure(self) -> None:
        super().configure()
        if self.cfg.texture:
            # texture stage trains only the feature field; geometry frozen
            # (reference runs it as a separate stage from a geometry ckpt)
            self.geometry.cfg.fix_geometry = True

    def make_train_step(self):
        guidance = self.guidance
        renderer = self.renderer
        prompt_utils = self.prompt_utils
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer
        texture = self.cfg.texture
        latent_steps = self.cfg.latent_steps

        def train_step(state, guidance_params, rays_o, rays_d, light_positions,
                       height, width, elevation, azimuth, camera_distances, rng):
            step = state["step"]
            k_render, k_guide = jax.random.split(rng)

            def loss_fn(params):
                out = renderer.render_rays(
                    params["geo"], params["bg"], state["render"],
                    rays_o, rays_d, light_positions, k_render,
                    step=step, is_train=True, render_rgb=texture,
                )
                metrics = {}
                if texture:
                    rgb = out["comp_rgb"].reshape(1, height, width, 3)
                    gout = guidance(
                        guidance_params, rgb, prompt_utils,
                        elevation, azimuth, camera_distances,
                        step=step, rng=k_guide,
                    )
                    loss = C_jax(loss_cfg.get("lambda_sds", 1.0), step) * gout["loss_sds"]
                else:
                    normal_img = out["comp_normal"].reshape(1, height, width, 3)
                    opacity_img = out["opacity"].reshape(1, height, width, 1)
                    # two sub-phases, both traced; lax.cond picks per step
                    # (fantasia3d.py:51-62)
                    latent_in = jnp.concatenate(
                        [normal_img * 2.0 - 1.0, opacity_img], axis=-1
                    )
                    g_lat = guidance(
                        guidance_params, latent_in, prompt_utils,
                        elevation, azimuth, camera_distances,
                        step=step, rng=k_guide, rgb_as_latents=True,
                    )
                    g_rgb = guidance(
                        guidance_params, normal_img, prompt_utils,
                        elevation, azimuth, camera_distances,
                        step=step, rng=k_guide, rgb_as_latents=False,
                    )
                    use_latent = (step < latent_steps).astype(jnp.float32)
                    gout = {
                        k: use_latent * g_lat[k] + (1.0 - use_latent) * g_rgb[k]
                        for k in ("loss_sds", "grad_norm")
                    }
                    gout["min_step"] = g_lat["min_step"]
                    gout["max_step"] = g_lat["max_step"]
                    loss = C_jax(loss_cfg.get("lambda_sds", 1.0), step) * gout["loss_sds"]

                    mesh = out["mesh"]
                    loss_nc = dmtet.normal_consistency(
                        mesh.tri_verts, mesh.valid, mesh.edge_gid
                    )
                    loss = loss + C_jax(
                        loss_cfg.get("lambda_normal_consistency", 0.0), step
                    ) * loss_nc
                    metrics["loss_normal_consistency"] = loss_nc

                metrics["loss_sds"] = gout["loss_sds"]
                metrics["loss"] = loss
                metrics["grad_norm"] = gout["grad_norm"]
                metrics["min_step"] = gout["min_step"]
                metrics["max_step"] = gout["max_step"]
                return loss, metrics

            params = {"geo": state["geo"], "bg": state["bg"]}
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, state["opt"], params)
            new_params = optax.apply_updates(params, updates)
            return {
                "geo": new_params["geo"], "bg": new_params["bg"],
                "opt": new_opt, "render": state["render"], "step": step + 1,
            }, metrics

        return jax.jit(train_step, static_argnames=("height", "width"))
