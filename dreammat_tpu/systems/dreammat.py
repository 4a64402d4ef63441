"""DreamMat system: composes renderer + guidance into one jitted train step.

Rebuild of the reference system layer
(/root/reference/threestudio_dreammat/threestudio/systems/dreammat.py:19-300
and systems/base.py:21-394). Architectural stance (SURVEY §7): the whole
per-step pipeline — field query -> MC shade -> VAE encode -> 3x
(ControlNet+UNet) -> CSD grad -> optax update — is ONE jitted function over
explicit pytree state; schedules evaluate inside the trace; the python loop
only picks (view, env) and feeds fixed-shape batches.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dreammat_tpu
from dreammat_tpu.systems.optimizers import parse_optimizer
from dreammat_tpu.utils import saving
from dreammat_tpu.utils.base import BaseObject
from dreammat_tpu.utils.ckpt import load_checkpoint, save_checkpoint
from dreammat_tpu.utils.schedule import C, C_jax


@dreammat_tpu.register("dreammat-system")
class DreamMat(BaseObject):
    @dataclass
    class Config:
        texture: bool = True
        latent_steps: int = 1000
        save_train_image: bool = True
        save_train_image_iter: int = 1000
        init_step: int = 0
        init_width: int = 512
        init_height: int = 512
        test_background_white: bool = False

        geometry_type: str = "dreammat-mesh"
        geometry: dict = field(default_factory=dict)
        material_type: str = "dreammat-material"
        material: dict = field(default_factory=dict)
        background_type: str = "solid-color-background"
        background: dict = field(default_factory=dict)
        renderer_type: str = "raytracing-renderer"
        renderer: dict = field(default_factory=dict)
        guidance_type: str = "stable-diffusion-dreammat-guidance"
        guidance: dict = field(default_factory=dict)
        prompt_processor_type: str = "stable-diffusion-prompt-processor"
        prompt_processor: dict = field(default_factory=dict)
        # exporter config block (reference base.py exporter_type/exporter);
        # texture_size feeds system.export
        exporter: dict = field(default_factory=dict)

        loss: dict = field(default_factory=lambda: {"lambda_sds": 1.0, "lambda_mat_reg": 1.0})
        optimizer: dict = field(
            default_factory=lambda: {
                "name": "Adam",
                "args": {"lr": 0.01, "betas": [0.9, 0.99], "eps": 1.0e-15},
            }
        )
        loggers: dict = field(default_factory=dict)
        seed: int = 0

    cfg: Config

    def configure(self) -> None:
        """Assemble components (BaseLift3DSystem.configure, base.py:243-295)."""
        import dreammat_tpu.models  # ensure registry

        self.geometry = dreammat_tpu.find(self.cfg.geometry_type)(self.cfg.geometry)
        self.material = dreammat_tpu.find(self.cfg.material_type)(self.cfg.material)
        self.background = dreammat_tpu.find(self.cfg.background_type)(self.cfg.background)
        self.renderer = dreammat_tpu.find(self.cfg.renderer_type)(
            self.cfg.renderer, self.geometry, self.material, self.background
        )
        self.guidance = None
        self.prompt_processor = None
        self.prompt_utils = None
        self._train_step_fn = None
        self._render_fn = None

    # ------------------------------------------------------------------
    def on_fit_start(self, rng: jax.Array, latent_hw=None) -> None:
        """Build guidance + prompt embeddings (dreammat.py:44-55)."""
        if self.guidance is None:
            self.guidance = dreammat_tpu.find(self.cfg.guidance_type)(self.cfg.guidance)
            self.guidance.init_params(rng, latent_hw=latent_hw)
        if self.prompt_processor is None:
            self.prompt_processor = dreammat_tpu.find(self.cfg.prompt_processor_type)(
                self.cfg.prompt_processor
            )
            self.prompt_utils = self.prompt_processor()

    def init_state(self, rng: jax.Array) -> Dict[str, Any]:
        geo_params = self.geometry.init(rng)
        self.optimizer = parse_optimizer(self.cfg.optimizer)
        opt_state = self.optimizer.init(geo_params)
        return {"geo": geo_params, "opt": opt_state, "step": jnp.int32(0)}

    # ------------------------------------------------------------------
    def make_train_step(self):
        """Returns jitted (state, batch, rng) -> (state, metrics)."""
        guidance = self.guidance
        renderer = self.renderer
        prompt_utils = self.prompt_utils
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer

        def train_step(state, guidance_params, gbuffer, condition_map, env_id,
                       elevation, azimuth, camera_distances, rng, light_table=None,
                       enc_maps=None, pixel_vis=None):
            # guidance_params passed as an argument — NOT closed over — so the
            # ~5 GB of frozen SD weights are jit inputs, not baked constants
            step = state["step"]
            k_render, k_guide = jax.random.split(rng)

            def loss_fn(geo_params):
                out = renderer.shade_view(
                    geo_params, gbuffer, env_id, k_render, is_train=True,
                    light_table=light_table, enc_maps=enc_maps,
                    pixel_vis=pixel_vis,
                )
                guidance_out = guidance(
                    guidance_params,
                    out["comp_rgb"][None],
                    prompt_utils,
                    elevation, azimuth, camera_distances,
                    condition_map,
                    step=step,
                    rng=k_guide,
                )
                loss = (
                    C_jax(loss_cfg.get("lambda_sds", 1.0), step) * guidance_out["loss_sds"]
                    + C_jax(loss_cfg.get("lambda_mat_reg", 1.0), step) * out["loss_mat_reg"]
                )
                metrics = {
                    "loss": loss,
                    "loss_sds": guidance_out["loss_sds"],
                    "loss_mat_reg": out["loss_mat_reg"],
                    "grad_norm": guidance_out["grad_norm"],
                    "min_step": guidance_out["min_step"],
                    "max_step": guidance_out["max_step"],
                }
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["geo"])
            updates, new_opt = optimizer.update(grads, state["opt"], state["geo"])
            new_geo = optax.apply_updates(state["geo"], updates)
            new_state = {"geo": new_geo, "opt": new_opt, "step": step + 1}
            return new_state, metrics

        return jax.jit(train_step)

    def on_train_batch_start(self, state, it: int, rng: jax.Array):
        """Per-step state hook before the jitted step (reference
        Updateable.do_update_step, base.py:174-178). Base: no-op."""
        return state

    def _apply_train_step(self, state, batch, rng):
        """Maps a collated batch onto the jitted train step's signature —
        the one system-specific seam in the shared fit loop."""
        return self._train_step_fn(
            state, self.guidance.params, batch["gbuffer"], batch["condition_map"],
            batch["env_id"], batch["elevation"], batch["azimuth"],
            batch["camera_distances"], rng, batch.get("light_table"),
            batch.get("enc_maps"), batch.get("pixel_vis"),
        )

    def make_render_fn(self):
        renderer = self.renderer

        def render(geo_params, gbuffer, env_id, rng, light_table=None):
            return renderer.shade_view(
                geo_params, gbuffer, env_id, rng, is_train=False,
                light_table=light_table,
            )

        return jax.jit(render)

    # ------------------------------------------------------------------
    def fit(
        self,
        datamodule,
        max_steps: int,
        state: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        trial_dir: str = "outputs/dreammat",
        val_check_interval: int = 100,
        checkpoint_every: int = 4000,
        save_train_image_iter: Optional[int] = None,
        log_every: int = 10,
    ) -> Dict[str, Any]:
        """Training loop (Lightning fit replacement, launch.py:189)."""
        rng = jax.random.PRNGKey(seed)
        k_init, k_guidance, rng = jax.random.split(rng, 3)
        self.on_fit_start(k_guidance)
        if state is None:
            state = self.init_state(k_init)
        else:
            self.optimizer = parse_optimizer(self.cfg.optimizer)

        if self._train_step_fn is None:
            self._train_step_fn = self.make_train_step()
        if self._render_fn is None:
            self._render_fn = self.make_render_fn()

        os.makedirs(trial_dir, exist_ok=True)
        from dreammat_tpu.utils.loggers import (
            CSVLogger, MultiLogger, ProgressWriter, TSVEventLogger, WandbLogger,
        )

        from dreammat_tpu.utils.tboard import TensorBoardLogger

        wandb_cfg = dict(self.cfg.loggers.get("wandb", {})) if self.cfg.loggers else {}
        metric_logger = MultiLogger(
            CSVLogger(os.path.join(trial_dir, "logs")),
            TSVEventLogger(os.path.join(trial_dir, "logs")),
            # reference launch.py:162-165 creates TensorBoard+CSV loggers;
            # tboard.py hand-encodes the event protos (no tb dependency)
            TensorBoardLogger(os.path.join(trial_dir, "tb")),
            WandbLogger(
                wandb_cfg.get("project", "dreammat_tpu"),
                enable=wandb_cfg.get("enable", False),
            ),
        )
        progress = ProgressWriter(os.path.join(trial_dir, "progress"))
        t0 = time.time()
        t_warm = None  # set after the first step (separates compile time)
        start_step = int(state["step"])
        for it in range(start_step, max_steps):
            batch = datamodule.collate(step=it)
            rng, k = jax.random.split(rng)
            state = self.on_train_batch_start(state, it, k)
            state, metrics = self._apply_train_step(state, batch, k)
            if t_warm is None:
                jax.block_until_ready(metrics["loss"])
                t_warm = time.time()
                dreammat_tpu.info("first step (incl. compile): %.1fs", t_warm - t0)
            if (it + 1) % log_every == 0:
                m = {k_: float(v) for k_, v in metrics.items()}
                warm_steps = it - start_step  # steps after the compile step
                sps = warm_steps / max(time.time() - t_warm, 1e-6) if warm_steps > 0 else 0.0
                dreammat_tpu.info(
                    "step %d loss=%.4f sds=%.4f reg=%.5f (%.2f it/s warm)",
                    it + 1, m["loss"], m.get("loss_sds", 0.0),
                    m.get("loss_mat_reg", 0.0), sps,
                )
                metric_logger.log({**m, "it_per_sec": sps}, it + 1)
                progress.update(it + 1, max_steps)
            if (
                self.cfg.save_train_image
                and (it + 1) % (save_train_image_iter or self.cfg.save_train_image_iter) == 0
            ):
                self.save_train_grid(state, batch, trial_dir, it + 1)
            if val_check_interval and (it + 1) % val_check_interval == 0:
                self.validation(state, datamodule, trial_dir, it + 1)
            if checkpoint_every and (it + 1) % checkpoint_every == 0:
                save_checkpoint(
                    os.path.join(trial_dir, "ckpts", f"step{it+1:06d}"), state, it + 1
                )
        return state

    # ------------------------------------------------------------------
    def save_train_grid(self, state, batch, trial_dir: str, step: int) -> str:
        """Train-time grid: render channels + condition-map slices
        (reference dreammat.py:88-179 saves 8 render + condition channels)."""
        out = (self._render_fn or self.make_render_fn())(
            state["geo"], batch["gbuffer"], batch["env_id"], jax.random.PRNGKey(step),
            batch.get("light_table"),
        )
        cond = np.asarray(batch["condition_map"])[0]
        rows = [
            [
                {"img": np.asarray(out["comp_rgb"])},
                {"img": np.asarray(out["specular_light"])},
                {"img": np.asarray(out["diffuse_light"])},
                {"img": np.asarray(out["comp_normal"])},
                {"img": np.asarray(out["comp_depth"])[..., 0]},
                {"img": np.asarray(out["albedo"])},
                {"img": np.asarray(out["roughness"])[..., 0]},
                {"img": np.asarray(out["metalness"])[..., 0]},
            ],
            [
                {"img": cond[..., 0]},          # depth
                {"img": cond[..., 1:4]},        # normal
                {"img": cond[..., 4:7]},        # probe m0r0
                {"img": cond[..., 7:10]},       # m0r.5
                {"img": cond[..., 10:13]},      # m0r1
                {"img": cond[..., 13:16]},      # m1r0
                {"img": cond[..., 16:19]},      # m1r.5
                {"img": cond[..., 19:22]},      # m1r1
            ],
        ]
        path = os.path.join(trial_dir, "save", f"it{step}-train.png")
        return saving.save_image_grid(path, rows)

    def validation(self, state, datamodule, trial_dir: str, step: int) -> str:
        """PBR channel grid on a validation view (dreammat.py:182-242)."""
        batch = datamodule.collate(step=step)
        rng = jax.random.PRNGKey(step)
        out = (self._render_fn or self.make_render_fn())(
            state["geo"], batch["gbuffer"], batch["env_id"], rng,
            batch.get("light_table"),
        )
        rows = [[
            {"img": np.asarray(out["comp_rgb"])},
            {"img": np.asarray(out["albedo"])},
            {"img": np.asarray(out["metalness"])[..., 0]},
            {"img": np.asarray(out["roughness"])[..., 0]},
            {"img": np.asarray(out["comp_normal"])},
            {"img": np.asarray(out["comp_depth"])[..., 0]},
        ]]
        path = os.path.join(trial_dir, "save", f"it{step}-val.png")
        return saving.save_image_grid(path, rows)

    def test(self, state, datamodule, trial_dir: str, step: int, n_views: Optional[int] = None) -> str:
        """Eval circle -> per-view PNGs + gif (dreammat.py:247-300)."""
        n = n_views or datamodule.cfg.n_test_views
        frames = []
        render = self._render_fn or self.make_render_fn()
        for i in range(n):
            batch = datamodule.eval_view(i)
            out = render(
                state["geo"], batch["gbuffer"], batch["env_id"],
                jax.random.PRNGKey(i), batch.get("light_table"),
            )
            rgb = np.asarray(out["comp_rgb"])
            alpha = np.asarray(out["opacity"])[..., 0]
            d = os.path.join(trial_dir, "save", f"it{step}-test")
            saving.save_image(os.path.join(d, f"{i}.png"), rgb)
            saving.save_image_with_alpha(
                os.path.join(d, "albedo", f"{i}.png"), np.asarray(out["albedo"]), alpha
            )
            saving.save_image_with_alpha(
                os.path.join(d, "roughness", f"{i}.png"),
                np.asarray(out["roughness"])[..., 0], alpha,
            )
            saving.save_image_with_alpha(
                os.path.join(d, "metallic", f"{i}.png"),
                np.asarray(out["metalness"])[..., 0], alpha,
            )
            frames.append(rgb)
        gif = os.path.join(trial_dir, "save", f"it{step}-test.gif")
        return saving.save_gif(gif, frames, fps=30)

    def export(self, state, trial_dir: str, texture_size: int = None) -> str:
        """Bake + save OBJ/MTL (on_predict_epoch_end path, base.py:309-345).
        Texture resolution comes from ``system.exporter.texture_size`` when
        configured (reference exporter config), else 2048."""
        from dreammat_tpu.models.exporter import MeshExporter

        if texture_size is None:
            texture_size = int(
                dict(getattr(self.cfg, "exporter", None) or {}).get(
                    "texture_size", 2048
                )
            )
        exporter = MeshExporter(
            {"texture_size": texture_size},
            self.geometry, self.material,
        )
        out_dir = os.path.join(trial_dir, "save", "export")
        return exporter.export_obj_with_mtl(state["geo"], out_dir)
