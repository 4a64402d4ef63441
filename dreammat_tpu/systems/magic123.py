"""Magic123 system: single image -> 3D with joint 2D (SD SDS) and 3D
(Zero123 SDS) priors.

TPU-native rebuild of ``magic123-system``
(/root/reference/threestudio_dreammat/threestudio/systems/magic123.py:
12-223): every optimizer step supervises the reference view
photometrically (rgb MSE + mask BCE, :60-74) and scores ONE random view
with BOTH guidances — the prompted stable-diffusion SDS (lambda_sds) and
the image-conditioned zero123 SDS (lambda_3d_sds, :45-88) — plus the
orient and 2D-normal-smoothness regularizers (:90-117). All of it traces
into one jitted train step; the two UNets run back-to-back on the same
rendered view.

``refinement=True`` (:118-128): the same ref-view + dual-guidance losses
over a DMTet mesh through the differentiable rasterizer, with the NeRF
regularizers replaced by mesh normal-consistency and uniform-Laplacian
smoothness (reference magic123.py:127-139) — runs on ``ops/dmtet.py``
like the magic3d/zero123 refinement stages.
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


@dreammat_tpu.register("magic123-system")
class Magic123(DreamFusion):
    @dataclass
    class Config(DreamFusion.Config):
        guidance_type: str = "stable-diffusion-guidance"
        guidance_3d_type: str = "zero123-guidance"
        guidance_3d: dict = field(default_factory=dict)
        refinement: bool = False
        # accepted for shared-config parity with zero123-system
        freq: dict = field(default_factory=dict)
        ambient_ratio_min: float = 0.5
        loss: dict = field(default_factory=lambda: {
            "lambda_sds": 0.025,
            "lambda_3d_sds": 1.0,
            "lambda_rgb": 1000.0,
            "lambda_mask": 100.0,
            "lambda_orient": 0.0,
            "lambda_normal_smoothness_2d": 0.0,
            "lambda_normal_consistency": 1000.0,
            "lambda_laplacian_smoothness": 0.0,
        })

    cfg: Config

    def configure(self) -> None:
        if self.cfg.refinement:
            # refinement stage defaults: explicit DMTet mesh through the
            # differentiable rasterizer (the reference switches config
            # types the same way between its two stages)
            if self.cfg.geometry_type == "implicit-volume":
                self.cfg.geometry_type = "tetrahedra-sdf-grid"
            if self.cfg.renderer_type == "nerf-volume-renderer":
                self.cfg.renderer_type = "nvdiff-rasterizer"
        super().configure()
        self.guidance_3d = None

    def on_fit_start(self, rng: jax.Array, latent_hw=None) -> None:
        k2d, k3d = jax.random.split(rng)
        super().on_fit_start(k2d, latent_hw=latent_hw)  # SD guidance + prompts
        if self.guidance_3d is None:
            self.guidance_3d = dreammat_tpu.find(self.cfg.guidance_3d_type)(
                self.cfg.guidance_3d
            )
            self.guidance_3d.init_params(k3d)

    def make_train_step(self):
        guidance = self.guidance
        guidance_3d = self.guidance_3d
        prompt_utils = self.prompt_utils
        renderer = self.renderer
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer
        refinement = self.cfg.refinement

        def train_step(state, guidance_params, guidance_3d_params,
                       ref_rays_o, ref_rays_d, ref_light, gt_rgb, gt_mask,
                       z_rays_o, z_rays_d, z_light, elevation, azimuth,
                       camera_distances, height, width, z_height, z_width, rng):
            step = state["step"]
            k_ref, k_z, k_g2, k_g3 = jax.random.split(rng, 4)

            def loss_fn(params):
                metrics = {}
                # both views in ONE batched render (same fusion as the
                # zero123 step: identical fixed shapes, split after)
                n_ref = ref_rays_o.shape[0]
                out_all = renderer.render_rays(
                    params["geo"], params["bg"], state["render"],
                    jnp.concatenate([ref_rays_o, z_rays_o]),
                    jnp.concatenate([ref_rays_d, z_rays_d]),
                    jnp.concatenate([ref_light, z_light]),
                    k_ref, step=step, is_train=True,
                )
                n_all = n_ref + z_rays_o.shape[0]
                out_r, out = {}, {}
                for key, val in out_all.items():
                    if hasattr(val, "shape") and val.ndim >= 1 and \
                            val.shape[0] == n_all:
                        out_r[key] = val[:n_ref]
                        out[key] = val[n_ref:]
                    else:
                        out_r[key] = val
                        out[key] = val

                # reference view (:60-74)
                m = gt_mask.reshape(-1)
                gt_c = gt_rgb.reshape(-1, 3) * m[:, None] + \
                    out_r["comp_rgb_bg"] * (1.0 - m[:, None])
                loss_rgb = jnp.mean((out_r["comp_rgb"] - gt_c) ** 2)
                op = jnp.clip(out_r["opacity"][:, 0], 1e-5, 1.0 - 1e-5)
                loss_mask = -jnp.mean(
                    m * jnp.log(op) + (1.0 - m) * jnp.log(1.0 - op)
                )
                loss = (
                    C_jax(loss_cfg.get("lambda_rgb", 0.0), step) * loss_rgb
                    + C_jax(loss_cfg.get("lambda_mask", 0.0), step) * loss_mask
                )
                metrics["loss_rgb"] = loss_rgb
                metrics["loss_mask"] = loss_mask

                # random view, both priors (:45-88)
                rgb = out["comp_rgb"].reshape(1, z_height, z_width, 3)
                g2 = guidance(
                    guidance_params, rgb, prompt_utils,
                    elevation, azimuth, camera_distances,
                    step=step, rng=k_g2,
                )
                g3 = guidance_3d(
                    guidance_3d_params, rgb, elevation, azimuth,
                    camera_distances, step=step, rng=k_g3,
                )
                loss = loss + C_jax(loss_cfg.get("lambda_sds", 0.0), step) * g2["loss_sds"]
                loss = loss + C_jax(
                    loss_cfg.get("lambda_3d_sds", 0.0), step) * g3["loss_sds"]
                metrics["loss_sds"] = g2["loss_sds"]
                metrics["loss_3d_sds"] = g3["loss_sds"]

                # regularizers: NeRF set for coarse (:90-117), mesh
                # normal-consistency + laplacian for refinement (:127-139)
                if refinement:
                    mesh = out["mesh"]
                    loss_nc = dmtet.normal_consistency(
                        mesh.tri_verts, mesh.valid, mesh.edge_gid
                    )
                    loss = loss + C_jax(
                        loss_cfg.get("lambda_normal_consistency", 0.0), step
                    ) * loss_nc
                    metrics["loss_normal_consistency"] = loss_nc
                    lam_lap = loss_cfg.get("lambda_laplacian_smoothness", 0.0)
                    if lam_lap:
                        loss_lap = dmtet.laplacian_smoothness(
                            mesh.tri_verts, mesh.valid, mesh.edge_gid
                        )
                        loss = loss + C_jax(lam_lap, step) * loss_lap
                        metrics["loss_laplacian_smoothness"] = loss_lap
                elif "normal" in out:
                    w = jax.lax.stop_gradient(out["weights"])
                    ndv = jnp.sum(out["normal"] * out["t_dirs"], axis=-1)
                    loss_orient = jnp.sum(
                        w * jnp.clip(ndv, 0.0, None) ** 2
                    ) / jnp.maximum(jnp.sum(out["opacity"] > 0), 1)
                    loss = loss + C_jax(
                        loss_cfg.get("lambda_orient", 0.0), step) * loss_orient
                    metrics["loss_orient"] = loss_orient
                if not refinement and "comp_normal" in out and loss_cfg.get(
                        "lambda_normal_smoothness_2d", 0.0):
                    nimg = out["comp_normal"].reshape(z_height, z_width, 3)
                    loss_ns = (
                        jnp.mean((nimg[1:, :] - nimg[:-1, :]) ** 2)
                        + jnp.mean((nimg[:, 1:] - nimg[:, :-1]) ** 2)
                    )
                    loss = loss + C_jax(
                        loss_cfg["lambda_normal_smoothness_2d"], step) * loss_ns
                    metrics["loss_normal_smoothness_2d"] = loss_ns

                metrics["loss"] = loss
                metrics["grad_norm"] = g2["grad_norm"]
                metrics["min_step"] = g2["min_step"]
                metrics["max_step"] = g2["max_step"]
                return loss, metrics

            params = {"geo": state["geo"], "bg": state["bg"]}
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, state["opt"], params)
            new_params = optax.apply_updates(params, updates)
            return {
                "geo": new_params["geo"], "bg": new_params["bg"],
                "opt": new_opt, "render": state["render"], "step": step + 1,
            }, metrics

        return jax.jit(
            train_step,
            static_argnames=("height", "width", "z_height", "z_width"),
        )

    def _apply_train_step(self, state, batch, rng):
        rc = batch["random_camera"]
        return self._train_step_fn(
            state, self.guidance.params, self.guidance_3d.params,
            batch["rays_o"], batch["rays_d"], batch["light_positions"],
            batch["rgb"], batch["mask"],
            rc["rays_o"], rc["rays_d"], rc["light_positions"],
            rc["elevation"], rc["azimuth"], rc["camera_distances"],
            batch["height"], batch["width"], rc["height"], rc["width"], rng,
        )
