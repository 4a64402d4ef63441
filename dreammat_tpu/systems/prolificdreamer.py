"""ProlificDreamer system: text-to-3D by Variational Score Distillation.

TPU-native rebuild of the reference coarse stage
(/root/reference/threestudio_dreammat/threestudio/systems/prolificdreamer.py:
13-160): NeRF volume + no-material (the coarse stage renders raw albedo) +
VSD guidance, with the orient / sparsity / opaque regularizers plus the
HiFA z-variance loss (:88-93).

Unlike the torch original — which runs the LoRA optimizer as a separate
Lightning parameter group outside the SDS autograd — the LoRA factors and
camera embedding live in the system state next to the geometry and are
updated by their own optax chain INSIDE the same jitted train step: one
dispatch per step covers render + both UNet branches + the LoRA regression
+ both optimizer updates. Gradient isolation comes from stop_gradients in
the guidance (loss_vsd sees frozen eps nets; loss_lora sees detached
latents), not from optimizer bookkeeping.

The reference's geometry/texture refinement stages (:47-57, :104-120)
run on the DMTet chain: ``stage=geometry`` optimizes a
``tetrahedra-sdf-grid`` mesh through the differentiable rasterizer with
the guidance scored on ``comp_normal`` (render_rgb=False) plus
normal-consistency/laplacian regularizers; ``stage=texture`` scores
``comp_rgb`` on the (typically frozen) mesh with no extra regularizers.
Guidance losses are applied generically (every ``loss_*`` output scaled
by its ``lambda_*``, reference :60-63), so either the VSD or the plain
SDS guidance works per stage, as upstream configs choose.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

import dreammat_tpu
from dreammat_tpu.ops import dmtet
from dreammat_tpu.systems.dreamfusion import DreamFusion, binary_cross_entropy
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("prolificdreamer-system")
class ProlificDreamer(DreamFusion):
    @dataclass
    class Config(DreamFusion.Config):
        stage: str = "coarse"
        material_type: str = "no-material"
        background_type: str = "neural-environment-map-background"
        guidance_type: str = "stable-diffusion-vsd-guidance"
        loss: dict = field(default_factory=lambda: {
            "lambda_vsd": 1.0,
            "lambda_lora": 1.0,
            "lambda_orient": 0.0,
            "lambda_sparsity": 10.0,
            "lambda_opaque": [10000, 0.0, 1000.0, 10001],
            "lambda_z_variance": 0.0,
        })
        optimizer_lora: dict = field(default_factory=lambda: {
            "name": "AdamW",
            "args": {"lr": 1.0e-4, "betas": [0.9, 0.99], "eps": 1.0e-15},
        })

    cfg: Config

    def configure(self) -> None:
        if self.cfg.stage not in ("coarse", "geometry", "texture"):
            raise ValueError(f"Unknown stage {self.cfg.stage}")
        if self.cfg.stage != "coarse":
            # refinement stages: explicit DMTet mesh through the
            # differentiable rasterizer (upstream configs switch types the
            # same way between stages)
            if self.cfg.geometry_type == "implicit-volume":
                self.cfg.geometry_type = "tetrahedra-sdf-grid"
            if self.cfg.renderer_type == "nerf-volume-renderer":
                self.cfg.renderer_type = "nvdiff-rasterizer"
        super().configure()

    def init_state(self, rng: jax.Array) -> Dict[str, Any]:
        from dreammat_tpu.systems.optimizers import parse_optimizer

        state = super().init_state(rng)
        assert self.guidance is not None, "on_fit_start before init_state"
        if hasattr(self.guidance, "init_lora"):
            lora = self.guidance.init_lora(jax.random.fold_in(rng, 0x70AA))
            self.optimizer_lora = parse_optimizer(self.cfg.optimizer_lora)
            state["lora"] = lora
            state["opt_lora"] = self.optimizer_lora.init(lora)
        else:
            self.optimizer_lora = None
        return state

    def make_train_step(self):
        guidance = self.guidance
        renderer = self.renderer
        prompt_utils = self.prompt_utils
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer
        optimizer_lora = self.optimizer_lora
        stage = self.cfg.stage
        has_lora = hasattr(self.guidance, "init_lora")

        def train_step(state, guidance_params, rays_o, rays_d, light_positions,
                       c2w, height, width, elevation, azimuth, camera_distances,
                       rng):
            step = state["step"]
            k_render, k_guide = jax.random.split(rng)

            def loss_fn(params):
                out = renderer.render_rays(
                    params["geo"], params["bg"], state["render"],
                    rays_o, rays_d, light_positions, k_render,
                    step=step, is_train=True,
                    **({"render_rgb": False} if stage == "geometry" else {}),
                )
                # geometry stage scores the normal map (reference :47-52)
                key = "comp_normal" if stage == "geometry" else "comp_rgb"
                gin = out[key].reshape(1, height, width, 3)
                gkw = {"c2w": c2w, "lora_params": params["lora"]} if has_lora \
                    else {}
                gout = guidance(
                    guidance_params, gin, prompt_utils,
                    elevation, azimuth, camera_distances,
                    step=step, rng=k_guide, **gkw,
                )
                # every guidance loss_* scaled by its lambda_* (reference
                # :60-63) — works for loss_vsd+loss_lora or loss_sds alike
                loss = 0.0
                metrics = {}
                for name, value in gout.items():
                    if name.startswith("loss_"):
                        loss = loss + C_jax(
                            loss_cfg.get("lambda_" + name[5:], 1.0), step
                        ) * value
                        metrics[name] = value

                if stage == "geometry":
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
                if stage != "coarse":
                    metrics["loss"] = loss
                    metrics["grad_norm"] = gout["grad_norm"]
                    metrics["min_step"] = gout["min_step"]
                    metrics["max_step"] = gout["max_step"]
                    return loss, metrics

                if "normal" in out:
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

                # HiFA z-variance over solid pixels (prolificdreamer.py:88-93)
                # as a masked mean (the boolean-index original is a dynamic
                # shape)
                m = (out["opacity"] > 0.5).astype(jnp.float32)
                loss_zv = jnp.sum(out["z_variance"] * m) / jnp.maximum(m.sum(), 1.0)
                loss = loss + C_jax(loss_cfg.get("lambda_z_variance", 0.0), step) * loss_zv
                metrics["loss_z_variance"] = loss_zv

                metrics["loss"] = loss
                metrics["grad_norm"] = gout["grad_norm"]
                metrics["min_step"] = gout["min_step"]
                metrics["max_step"] = gout["max_step"]
                return loss, metrics

            params = {"geo": state["geo"], "bg": state["bg"]}
            if has_lora:
                params["lora"] = state["lora"]
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

            scene = {"geo": params["geo"], "bg": params["bg"]}
            scene_grads = {"geo": grads["geo"], "bg": grads["bg"]}
            updates, new_opt = optimizer.update(scene_grads, state["opt"], scene)
            scene = optax.apply_updates(scene, updates)

            new_state = {
                "geo": scene["geo"], "bg": scene["bg"],
                "opt": new_opt, "render": state["render"], "step": step + 1,
            }
            if has_lora:
                lora_updates, new_opt_lora = optimizer_lora.update(
                    grads["lora"], state["opt_lora"], params["lora"]
                )
                new_state["lora"] = optax.apply_updates(
                    params["lora"], lora_updates
                )
                new_state["opt_lora"] = new_opt_lora
            return new_state, metrics

        return jax.jit(train_step, static_argnames=("height", "width"))

    def _apply_train_step(self, state, batch, rng):
        return self._train_step_fn(
            state, self.guidance.params, batch["rays_o"], batch["rays_d"],
            batch["light_positions"], batch["c2w"], batch["height"],
            batch["width"], batch["elevation"], batch["azimuth"],
            batch["camera_distances"], rng,
        )
