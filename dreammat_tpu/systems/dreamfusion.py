"""DreamFusion system: text-to-3D by SDS over a NeRF volume.

TPU-native rebuild of the reference
(/root/reference/threestudio_dreammat/threestudio/systems/dreamfusion.py:
11-155): implicit-volume geometry + diffuse-point-light material +
nerf-volume-renderer, optimized by plain SDS guidance, with the orient /
sparsity / opaque regularizers (dreamfusion.py:51-70).

Runtime shape follows the DreamMat system (one jitted train step, pytree
state, python loop feeds fixed-shape ray batches); the state additionally
carries the background params (trainable for neural-envmap backgrounds)
and the renderer's occupancy grid, which is EMA-refreshed every
``renderer.grid_update_every`` steps via the ``on_train_batch_start`` hook
(reference nerf_volume_renderer.py:422-436 update_step).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dreammat_tpu
from dreammat_tpu.systems.dreammat import DreamMat
from dreammat_tpu.utils import saving
from dreammat_tpu.utils.schedule import C_jax


def binary_cross_entropy(x, y):
    """BCE with x as both input and target (opaque loss, utils/ops.py)."""
    return -(y * jnp.log(x) + (1 - y) * jnp.log(1 - x)).mean()


@dreammat_tpu.register("dreamfusion-system")
class DreamFusion(DreamMat):
    @dataclass
    class Config(DreamMat.Config):
        geometry_type: str = "implicit-volume"
        material_type: str = "diffuse-with-point-light-material"
        background_type: str = "neural-environment-map-background"
        renderer_type: str = "nerf-volume-renderer"
        guidance_type: str = "stable-diffusion-guidance"
        loss: dict = field(default_factory=lambda: {
            "lambda_sds": 1.0,
            "lambda_orient": [0, 10.0, 1000.0, 5000],
            "lambda_sparsity": 1.0,
            "lambda_opaque": 0.0,
        })

    cfg: Config

    def init_state(self, rng: jax.Array) -> Dict[str, Any]:
        from dreammat_tpu.systems.optimizers import parse_optimizer

        k_geo, k_bg, k_occ = jax.random.split(rng, 3)
        geo_params = self.geometry.init(k_geo)
        bg_params = self.background.init(k_bg)
        self.optimizer = parse_optimizer(self.cfg.optimizer)
        params = {"geo": geo_params, "bg": bg_params}
        opt_state = self.optimizer.init(params)
        render_state = self.renderer.update_occ(
            geo_params, self.renderer.init_state(k_occ), k_occ
        )
        return {
            "geo": geo_params,
            "bg": bg_params,
            "opt": opt_state,
            "render": render_state,
            "step": jnp.int32(0),
        }

    # -- occupancy refresh hook ---------------------------------------------
    def on_train_batch_start(self, state, it: int, rng: jax.Array):
        if self.renderer.cfg.estimator == "occgrid" and self.renderer.cfg.grid_prune \
                and it % max(self.renderer.cfg.grid_update_every, 1) == 0:
            if not hasattr(self, "_occ_update_fn"):
                self._occ_update_fn = jax.jit(self.renderer.update_occ)
            state = dict(state)
            state["render"] = self._occ_update_fn(
                state["geo"], state["render"], jax.random.fold_in(rng, 0x0CC)
            )
        return state

    # -- train step ----------------------------------------------------------
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
                    step=step, is_train=True,
                )
                rgb = out["comp_rgb"].reshape(1, height, width, 3)
                guidance_out = guidance(
                    guidance_params, rgb, prompt_utils,
                    elevation, azimuth, camera_distances,
                    step=step, rng=k_guide,
                )
                loss = C_jax(loss_cfg.get("lambda_sds", 1.0), step) * guidance_out["loss_sds"]
                metrics = {"loss_sds": guidance_out["loss_sds"]}

                # orientation loss (dreamfusion.py:51-61): backfacing
                # visible normals penalized, normalized by #foreground rays
                if "normal" in out:
                    w = jax.lax.stop_gradient(out["weights"])
                    ndv = jnp.sum(out["normal"] * out["t_dirs"], axis=-1)
                    loss_orient = jnp.sum(
                        w * jnp.clip(ndv, 0.0, None) ** 2
                    ) / jnp.maximum(jnp.sum(out["opacity"] > 0), 1)
                    loss = loss + C_jax(loss_cfg.get("lambda_orient", 0.0), step) * loss_orient
                    metrics["loss_orient"] = loss_orient

                # sparsity loss (dreamfusion.py:63-65)
                loss_sparsity = jnp.sqrt(out["opacity"] ** 2 + 0.01).mean()
                loss = loss + C_jax(loss_cfg.get("lambda_sparsity", 0.0), step) * loss_sparsity
                metrics["loss_sparsity"] = loss_sparsity

                # opaque loss (dreamfusion.py:67-70)
                oc = jnp.clip(out["opacity"], 1e-3, 1.0 - 1e-3)
                loss_opaque = binary_cross_entropy(oc, oc)
                loss = loss + C_jax(loss_cfg.get("lambda_opaque", 0.0), step) * loss_opaque
                metrics["loss_opaque"] = loss_opaque

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
                "geo": new_params["geo"],
                "bg": new_params["bg"],
                "opt": new_opt,
                "render": state["render"],
                "step": step + 1,
            }, metrics

        return jax.jit(train_step, static_argnames=("height", "width"))

    def _apply_train_step(self, state, batch, rng):
        return self._train_step_fn(
            state, self.guidance.params, batch["rays_o"], batch["rays_d"],
            batch["light_positions"], batch["height"], batch["width"],
            batch["elevation"], batch["azimuth"], batch["camera_distances"], rng,
        )

    # -- eval ----------------------------------------------------------------
    def make_render_fn(self):
        return None  # volume eval renders via renderer.render_image (chunked)

    def _eval_out(self, state, batch, step):
        return self.renderer.render_image(
            state["geo"], state["bg"], state["render"],
            batch["rays_o"], batch["rays_d"], batch["light_position"],
            jax.random.PRNGKey(0), step=step,
        )

    def save_train_grid(self, state, batch, trial_dir: str, step: int) -> str:
        h, w = batch["height"], batch["width"]
        out = self.renderer.render_rays(
            state["geo"], state["bg"], state["render"],
            batch["rays_o"], batch["rays_d"], batch["light_positions"],
            jax.random.PRNGKey(step), step=step, is_train=False,
        )
        rows = [[
            {"img": np.asarray(out["comp_rgb"]).reshape(h, w, 3)},
            {"img": np.asarray(out["opacity"]).reshape(h, w)},
            {"img": np.asarray(out["depth"]).reshape(h, w)},
        ]]
        if "comp_normal" in out:
            rows[0].append({"img": np.asarray(out["comp_normal"]).reshape(h, w, 3)})
        path = os.path.join(trial_dir, "save", f"it{step}-train.png")
        return saving.save_image_grid(path, rows)

    def validation(self, state, datamodule, trial_dir: str, step: int) -> str:
        batch = datamodule.eval_rays(0)
        out = self._eval_out(state, batch, step)
        rows = [[
            {"img": np.asarray(out["comp_rgb"])},
            {"img": np.asarray(out["opacity"])[..., 0]},
        ]]
        if "comp_normal" in out:
            rows[0].insert(1, {"img": np.asarray(out["comp_normal"])})
        path = os.path.join(trial_dir, "save", f"it{step}-val.png")
        return saving.save_image_grid(path, rows)

    def test(self, state, datamodule, trial_dir: str, step: int,
             n_views: Optional[int] = None) -> str:
        n = n_views or datamodule.cfg.n_test_views
        frames = []
        d = os.path.join(trial_dir, "save", f"it{step}-test")
        for i in range(n):
            batch = datamodule.eval_rays(i)
            out = self._eval_out(state, batch, step)
            rgb = np.asarray(out["comp_rgb"])
            saving.save_image(os.path.join(d, f"{i}.png"), rgb)
            frames.append(rgb)
        gif = os.path.join(trial_dir, "save", f"it{step}-test.gif")
        return saving.save_gif(gif, frames, fps=30)

    def export(self, state, trial_dir: str, texture_size: int = 2048) -> str:
        """Isosurface (marching tets) + per-vertex albedo -> colored OBJ
        (reference exports via geometry.isosurface + mesh exporter)."""
        verts, faces = self.geometry.isosurface_mesh(state["geo"])
        d = os.path.join(trial_dir, "save", "export")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "model.obj")
        if len(verts):
            feat = self.geometry.export(state["geo"], jnp.asarray(verts)).get("features")
            albedo = (
                np.asarray(self.material.export(feat)["albedo"])
                if feat is not None else np.ones_like(verts) * 0.5
            )
        else:
            albedo = np.zeros((0, 3), np.float32)
        with open(path, "w") as f:
            for v, c in zip(verts, albedo):
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} "
                        f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n")
            for tri in faces + 1:
                f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
        dreammat_tpu.info("exported isosurface: %d verts, %d faces -> %s",
                          len(verts), len(faces), path)
        return path
