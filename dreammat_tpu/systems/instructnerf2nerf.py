"""Instruct-NeRF2NeRF system: text-instructed editing of a captured NeRF.

TPU-native rebuild of ``instructnerf2nerf-system``
(/root/reference/threestudio_dreammat/threestudio/systems/
instructnerf2nerf.py:14-212): iterative-dataset-update training over a
multiview capture — every ``per_editing_step`` steps (after
``start_editing_step``) the current render of the sampled frame is pushed
through the InstructPix2Pix editor conditioned on the ORIGINAL frame and
the instruction, and the edited image replaces that frame's training
target; the NeRF then fits the moving targets with L1 + perceptual loss
plus the usual orient/sparsity/opaque regularizers.

Mapping to this framework: ``edit_frames`` is a host-side numpy dict keyed
by frame index (exactly the reference's, :27,50-74); the editor runs as a
separate jitted function (render eval + ip2p edit); the train step is the
one jitted function shared across frames (targets are traced inputs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dreammat_tpu
from dreammat_tpu.systems.dreamfusion import DreamFusion, binary_cross_entropy
from dreammat_tpu.utils import perceptual
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("instructnerf2nerf-system")
class InstructNeRF2NeRF(DreamFusion):
    @dataclass
    class Config(DreamFusion.Config):
        guidance_type: str = "stable-diffusion-instructpix2pix-guidance"
        per_editing_step: int = 10
        start_editing_step: int = 1000
        vgg_cache_dir: str = "model/vgg16"
        loss: dict = field(default_factory=lambda: {
            "lambda_l1": 10.0,
            "lambda_p": 10.0,
            "lambda_orient": 0.0,
            "lambda_sparsity": 0.0,
            "lambda_opaque": 0.0,
        })

    cfg: Config

    def configure(self) -> None:
        super().configure()
        self.edit_frames: Dict[int, np.ndarray] = {}
        self.vgg_params = perceptual.init_vgg16(
            jax.random.PRNGKey(0), self.cfg.vgg_cache_dir
        )
        self._edit_fn = None

    def _maybe_edit(self, state, batch, it: int):
        """Refresh this frame's edit target (reference :59-74)."""
        cfg = self.cfg
        idx = int(batch["index"])
        if cfg.per_editing_step <= 0 or it <= cfg.start_editing_step:
            return
        if idx in self.edit_frames and it % cfg.per_editing_step != 0:
            return
        H, W = batch["height"], batch["width"]
        if self._edit_fn is None:
            guidance = self.guidance
            renderer = self.renderer
            prompt_utils = self.prompt_utils

            def edit(geo, bg, render_state, rays_o, rays_d, light, gt, rng):
                out = renderer.render_rays(
                    geo, bg, render_state, rays_o, rays_d, light,
                    rng, step=0, is_train=False,
                )
                rgb = out["comp_rgb"].reshape(1, H, W, 3)
                res = guidance(
                    guidance.params, rgb, gt[None], prompt_utils,
                    step=0, rng=rng,
                )
                return res["edit_images"][0]

            self._edit_fn = jax.jit(edit)
        img = self._edit_fn(
            state["geo"], state["bg"], state["render"],
            batch["rays_o"], batch["rays_d"], batch["light_positions"],
            batch["gt_rgb"], jax.random.PRNGKey(1000 + it),
        )
        self.edit_frames[idx] = np.asarray(img)

    def make_train_step(self):
        renderer = self.renderer
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer
        vgg_params = self.vgg_params

        def train_step(state, rays_o, rays_d, light_positions, gt_rgb,
                       height, width, rng):
            step = state["step"]
            k_render = rng

            def loss_fn(params):
                out = renderer.render_rays(
                    params["geo"], params["bg"], state["render"],
                    rays_o, rays_d, light_positions, k_render,
                    step=step, is_train=True,
                )
                pred = out["comp_rgb"].reshape(1, height, width, 3)
                gt = gt_rgb.reshape(1, height, width, 3)
                loss_l1 = jnp.mean(jnp.abs(pred - gt))
                loss_p = perceptual.perceptual_distance(vgg_params, pred, gt)
                loss = (
                    C_jax(loss_cfg.get("lambda_l1", 0.0), step) * loss_l1
                    + C_jax(loss_cfg.get("lambda_p", 0.0), step) * loss_p
                )
                metrics = {"loss_l1": loss_l1, "loss_p": loss_p}
                if "normal" in out:
                    w = jax.lax.stop_gradient(out["weights"])
                    ndv = jnp.sum(out["normal"] * out["t_dirs"], axis=-1)
                    loss_orient = jnp.sum(
                        w * jnp.clip(ndv, 0.0, None) ** 2
                    ) / jnp.maximum(jnp.sum(out["opacity"] > 0), 1)
                    loss = loss + C_jax(
                        loss_cfg.get("lambda_orient", 0.0), step) * loss_orient
                    metrics["loss_orient"] = loss_orient
                loss_sparsity = jnp.sqrt(out["opacity"] ** 2 + 0.01).mean()
                loss = loss + C_jax(
                    loss_cfg.get("lambda_sparsity", 0.0), step) * loss_sparsity
                oc = jnp.clip(out["opacity"], 1e-3, 1.0 - 1e-3)
                loss_opaque = binary_cross_entropy(oc, oc)
                loss = loss + C_jax(
                    loss_cfg.get("lambda_opaque", 0.0), step) * loss_opaque
                metrics["loss_sparsity"] = loss_sparsity
                metrics["loss_opaque"] = loss_opaque
                metrics["loss"] = loss
                metrics["grad_norm"] = jnp.float32(0.0)
                metrics["min_step"] = jnp.int32(0)
                metrics["max_step"] = jnp.int32(0)
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

    def _apply_train_step(self, state, batch, rng):
        it = int(state["step"])
        self._maybe_edit(state, batch, it)
        idx = int(batch["index"])
        gt = (
            jnp.asarray(self.edit_frames[idx])
            if idx in self.edit_frames else batch["gt_rgb"]
        )
        return self._train_step_fn(
            state, batch["rays_o"], batch["rays_d"], batch["light_positions"],
            gt, batch["height"], batch["width"], rng,
        )
