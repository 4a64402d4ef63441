"""Latent-NeRF system: SDS directly in Stable-Diffusion latent space.

TPU-native rebuild of the reference
(/root/reference/threestudio_dreammat/threestudio/systems/latentnerf.py:
11-155): the volume field emits 4 *latent* channels instead of RGB
(material "no-material", n_output_dims=4), the guidance consumes the
rendered latent image directly (``rgb_as_latents=True`` — no VAE encode in
the loop), and validation decodes through the VAE for visualization.
``refinement=True`` switches to RGB rendering with a normal encode pass
(the reference's second stage, latentnerf.py:34-41).

The ShapeLoss sketch-shape guide (latentnerf.py:27,89-97) is rebuilt
TPU-first in ``ops/shape_loss.py``: the reference's per-step libigl
winding-number + point-mesh-distance CPU round-trips become a one-time
voxel-grid bake at configure time plus an in-trace trilinear sample.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dreammat_tpu
from dreammat_tpu.ops.shape_loss import shape_loss as shape_loss_fn
from dreammat_tpu.systems.dreamfusion import DreamFusion, binary_cross_entropy
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("latentnerf-system")
class LatentNeRF(DreamFusion):
    @dataclass
    class Config(DreamFusion.Config):
        material_type: str = "no-material"
        material: dict = field(default_factory=lambda: {
            "n_output_dims": 4, "color_activation": "none",
        })
        background_type: str = "solid-color-background"
        guide_shape: Optional[str] = None
        # voxel resolution of the one-time winding/distance bake; the
        # reference evaluates igl exactly per step, so higher = closer
        guide_shape_grid_res: int = 64
        refinement: bool = False

    cfg: Config

    def configure(self) -> None:
        self.shape_grid = None
        if self.cfg.guide_shape is not None:
            from dreammat_tpu.models.mesh import load_obj, load_ply, load_glb
            from dreammat_tpu.ops import shape_loss as shape_loss_ops
            import os as _os

            ext = _os.path.splitext(self.cfg.guide_shape)[1].lower()
            loader = {".obj": load_obj, ".ply": load_ply,
                      ".glb": load_glb, ".gltf": load_glb}[ext]
            v, f = loader(self.cfg.guide_shape)[:2]
            self.shape_grid = shape_loss_ops.build_shape_grid(
                np.asarray(v), np.asarray(f),
                resolution=self.cfg.guide_shape_grid_res,
            )
        # the background must composite in the same space the field renders
        # (4 latent channels unless refinement renders RGB) — reference does
        # this via yaml (latent-nerf config n_output_dims: 4); forcing it
        # here keeps sparse configs working
        bg = dict(self.cfg.background or {})
        bg.setdefault("n_output_dims", self._n_render_ch)
        self.cfg.background = bg
        super().configure()

    @property
    def _n_render_ch(self) -> int:
        return 3 if self.cfg.refinement else 4

    def make_train_step(self):
        guidance = self.guidance
        renderer = self.renderer
        prompt_utils = self.prompt_utils
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer
        rgb_as_latents = not self.cfg.refinement
        n_ch = self._n_render_ch
        shape_grid = self.shape_grid

        def train_step(state, guidance_params, rays_o, rays_d, light_positions,
                       height, width, elevation, azimuth, camera_distances, rng):
            step = state["step"]
            k_render, k_guide = jax.random.split(rng)

            def loss_fn(params):
                out = renderer.render_rays(
                    params["geo"], params["bg"], state["render"],
                    rays_o, rays_d, light_positions, k_render,
                    step=step, is_train=True,
                )
                img = out["comp_rgb"].reshape(1, height, width, n_ch)
                guidance_out = guidance(
                    guidance_params, img, prompt_utils,
                    elevation, azimuth, camera_distances,
                    step=step, rng=k_guide, rgb_as_latents=rgb_as_latents,
                )
                loss = C_jax(loss_cfg.get("lambda_sds", 1.0), step) * guidance_out["loss_sds"]
                metrics = {"loss_sds": guidance_out["loss_sds"]}
                loss_sparsity = jnp.sqrt(out["opacity"] ** 2 + 0.01).mean()
                loss = loss + C_jax(loss_cfg.get("lambda_sparsity", 0.0), step) * loss_sparsity
                metrics["loss_sparsity"] = loss_sparsity
                oc = jnp.clip(out["opacity"], 1e-3, 1.0 - 1e-3)
                loss_opaque = binary_cross_entropy(oc, oc)
                loss = loss + C_jax(loss_cfg.get("lambda_opaque", 0.0), step) * loss_opaque
                metrics["loss_opaque"] = loss_opaque
                if "normal" in out:
                    w = jax.lax.stop_gradient(out["weights"])
                    ndv = jnp.sum(out["normal"] * out["t_dirs"], axis=-1)
                    loss_orient = jnp.sum(w * jnp.clip(ndv, 0.0, None) ** 2) / \
                        jnp.maximum(jnp.sum(out["opacity"] > 0), 1)
                    loss = loss + C_jax(loss_cfg.get("lambda_orient", 0.0), step) * loss_orient
                    metrics["loss_orient"] = loss_orient
                if shape_grid is not None and loss_cfg.get("lambda_shape", 0.0):
                    # sketch-shape CE (reference latentnerf.py:89-97)
                    loss_shape = shape_loss_fn(
                        out["points"], out["density"], shape_grid
                    )
                    loss = loss + C_jax(
                        loss_cfg["lambda_shape"], step) * loss_shape
                    metrics["loss_shape"] = loss_shape
                metrics["loss"] = loss
                metrics["grad_norm"] = guidance_out["grad_norm"]
                metrics["min_step"] = guidance_out["min_step"]
                metrics["max_step"] = guidance_out["max_step"]
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

    def _eval_out(self, state, batch, step):
        out = super()._eval_out(state, batch, step)
        if not self.cfg.refinement and self.guidance is not None:
            # decode the latent image for visualization (latentnerf.py:34-41)
            lat = out["comp_rgb"][None]
            out["comp_rgb"] = jnp.clip(
                self.guidance.decode_latents(self.guidance.params, lat)[0], 0.0, 1.0
            )
        elif not self.cfg.refinement:
            out["comp_rgb"] = jnp.clip(out["comp_rgb"][..., :3] * 0.5 + 0.5, 0.0, 1.0)
        return out
