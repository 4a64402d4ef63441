"""TextMesh system: text-to-3D over an implicit SDF with NeuS rendering.

TPU-native rebuild of the reference
(/root/reference/threestudio_dreammat/threestudio/systems/textmesh.py:
11-160): implicit-sdf geometry + NeuS volume renderer + SDS guidance, with
the orient / sparsity / opaque regularizers plus the eikonal loss on the
raw SDF gradient (:76-80). The learned NeuS variance joins the geometry in
the optimized state ("var"); ``on_fit_start`` runs the analytic shape
initialization (:36-38).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dreammat_tpu
from dreammat_tpu.systems.dreamfusion import DreamFusion, binary_cross_entropy
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("textmesh-system")
class TextMesh(DreamFusion):
    @dataclass
    class Config(DreamFusion.Config):
        geometry_type: str = "implicit-sdf"
        material_type: str = "diffuse-with-point-light-material"
        background_type: str = "neural-environment-map-background"
        renderer_type: str = "neus-volume-renderer"
        guidance_type: str = "stable-diffusion-guidance"
        loss: dict = field(default_factory=lambda: {
            "lambda_sds": 1.0,
            "lambda_orient": [0, 10.0, 1000.0, 5000],
            "lambda_sparsity": 1.0,
            "lambda_opaque": 0.0,
            "lambda_eikonal": 100.0,
        })

    cfg: Config

    def init_state(self, rng: jax.Array) -> Dict[str, Any]:
        from dreammat_tpu.systems.optimizers import parse_optimizer

        k_geo, k_bg, k_occ, k_shape = jax.random.split(rng, 4)
        geo_params = self.geometry.init(k_geo)
        geo_params = self.geometry.initialize_shape(geo_params, k_shape)
        bg_params = self.background.init(k_bg)
        var_params = self.renderer.init_variance()
        self.optimizer = parse_optimizer(self.cfg.optimizer)
        params = {"geo": geo_params, "bg": bg_params, "var": var_params}
        opt_state = self.optimizer.init(params)
        render_state = self.renderer.update_occ(
            geo_params, self.renderer.init_state(k_occ), k_occ
        )
        return {
            **params, "opt": opt_state, "render": render_state,
            "step": jnp.int32(0),
        }

    def make_train_step(self):
        guidance = self.guidance
        renderer = self.renderer
        prompt_utils = self.prompt_utils
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer

        def train_step(state, guidance_params, rays_o, rays_d, light_positions,
                       height, width, elevation, azimuth, camera_distances, rng):
            step = state["step"]
            k_render, k_guide = jax.random.split(rng)

            def loss_fn(params):
                out = renderer.render_rays(
                    params["geo"], params["bg"], state["render"],
                    rays_o, rays_d, light_positions, k_render,
                    step=step, is_train=True, var_params=params["var"],
                )
                rgb = out["comp_rgb"].reshape(1, height, width, 3)
                gout = guidance(
                    guidance_params, rgb, prompt_utils,
                    elevation, azimuth, camera_distances,
                    step=step, rng=k_guide,
                )
                loss = C_jax(loss_cfg.get("lambda_sds", 1.0), step) * gout["loss_sds"]
                metrics = {"loss_sds": gout["loss_sds"]}

                w = jax.lax.stop_gradient(out["weights"])
                ndv = jnp.sum(out["normal"] * out["t_dirs"], axis=-1)
                loss_orient = jnp.sum(w * jnp.clip(ndv, 0.0, None) ** 2) / \
                    jnp.maximum(jnp.sum(out["opacity"] > 0), 1)
                loss = loss + C_jax(loss_cfg.get("lambda_orient", 0.0), step) * loss_orient
                metrics["loss_orient"] = loss_orient

                loss_sparsity = jnp.sqrt(out["opacity"] ** 2 + 0.01).mean()
                loss = loss + C_jax(loss_cfg.get("lambda_sparsity", 0.0), step) * loss_sparsity
                metrics["loss_sparsity"] = loss_sparsity

                oc = jnp.clip(out["opacity"], 1e-3, 1.0 - 1e-3)
                loss_opaque = binary_cross_entropy(oc, oc)
                loss = loss + C_jax(loss_cfg.get("lambda_opaque", 0.0), step) * loss_opaque
                metrics["loss_opaque"] = loss_opaque

                # eikonal on the raw SDF gradient (textmesh.py:76-80)
                loss_eik = jnp.mean(
                    (jnp.linalg.norm(out["sdf_grad"], axis=-1) - 1.0) ** 2
                )
                loss = loss + C_jax(loss_cfg.get("lambda_eikonal", 0.0), step) * loss_eik
                metrics["loss_eikonal"] = loss_eik

                metrics["loss"] = loss
                metrics["inv_std"] = out["inv_std"]
                metrics["grad_norm"] = gout["grad_norm"]
                metrics["min_step"] = gout["min_step"]
                metrics["max_step"] = gout["max_step"]
                return loss, metrics

            params = {"geo": state["geo"], "bg": state["bg"], "var": state["var"]}
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, state["opt"], params)
            new_params = optax.apply_updates(params, updates)
            return {
                **new_params, "opt": new_opt,
                "render": state["render"], "step": step + 1,
            }, metrics

        return jax.jit(train_step, static_argnames=("height", "width"))

    def _eval_out(self, state, batch, step):
        return self.renderer.render_image(
            state["geo"], state["bg"], state["render"],
            batch["rays_o"], batch["rays_d"], batch["light_position"],
            jax.random.PRNGKey(0), step=step, var_params=state["var"],
        )

    def save_train_grid(self, state, batch, trial_dir: str, step: int) -> str:
        from dreammat_tpu.utils import saving

        h, w = batch["height"], batch["width"]
        out = self.renderer.render_rays(
            state["geo"], state["bg"], state["render"],
            batch["rays_o"], batch["rays_d"], batch["light_positions"],
            jax.random.PRNGKey(step), step=step, is_train=False,
            var_params=state["var"],
        )
        rows = [[
            {"img": np.asarray(out["comp_rgb"]).reshape(h, w, 3)},
            {"img": np.asarray(out["opacity"]).reshape(h, w)},
            {"img": np.asarray(out["comp_normal"]).reshape(h, w, 3)},
        ]]
        path = os.path.join(trial_dir, "save", f"it{step}-train.png")
        return saving.save_image_grid(path, rows)
