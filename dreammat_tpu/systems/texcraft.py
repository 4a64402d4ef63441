"""TexCraft system: texture generation with a config-selected guidance.

TPU-native rebuild of the reference's closest DreamMat sibling
(/root/reference/threestudio_dreammat/threestudio/systems/texcraft.py:23-175,
registered "texcraft-system"): same geometry/material/renderer composition,
but (a) the guidance type comes from config (texcraft.py:44 —
``threestudio.find(self.cfg.guidance_type)``), (b) the condition maps are
the LIVE render's depth/normal (texcraft.py:103-104 feeds
``out['comp_normal']``/``out['comp_depth']`` back into the guidance) rather
than DreamMat's prerendered light-probe stack, and (c) the loss is a
generic accumulation over every ``loss_*`` the guidance returns, each
weighted by its scheduled ``lambda_*`` (texcraft.py:110-114).

Inherits the DreamMat system's jitted-train-step runtime (fit/validate/
test/export, checkpointing, optimizer plumbing) — only the per-step loss
assembly differs, so the override is exactly the train-step builder."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import optax

import dreammat_tpu
from dreammat_tpu.systems.dreammat import DreamMat
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("texcraft-system")
class TexCraft(DreamMat):
    @dataclass
    class Config(DreamMat.Config):
        guidance_type: str = "stable-diffusion-guidance"
        render_depth: bool = True

    cfg: Config

    def make_train_step(self):
        guidance = self.guidance
        renderer = self.renderer
        prompt_utils = self.prompt_utils
        loss_cfg = dict(self.cfg.loss)
        optimizer = self.optimizer

        def train_step(state, guidance_params, gbuffer, condition_map, env_id,
                       elevation, azimuth, camera_distances, rng, light_table=None,
                       enc_maps=None, pixel_vis=None):
            step = state["step"]
            k_render, k_guide = jax.random.split(rng)

            def loss_fn(geo_params):
                out = renderer.shade_view(
                    geo_params, gbuffer, env_id, k_render, is_train=True,
                    light_table=light_table, enc_maps=enc_maps,
                    pixel_vis=pixel_vis,
                )
                # live conditions from this render (texcraft.py:103-104):
                # channel 0 = depth, 1:4 = normal — the slices the guidance's
                # 'depth'/'normal' control types consume
                live_cond = jnp.concatenate(
                    [out["comp_depth"], out["comp_normal"]], axis=-1
                )[None]
                guidance_out = guidance(
                    guidance_params,
                    jnp.clip(out["comp_rgb"], 0.0, 1.0)[None],
                    prompt_utils,
                    elevation, azimuth, camera_distances,
                    jax.lax.stop_gradient(live_cond),
                    step=step,
                    rng=k_guide,
                )
                # generic loss_* accumulation (texcraft.py:110-114)
                loss = C_jax(loss_cfg.get("lambda_mat_reg", 0.0), step) * out["loss_mat_reg"]
                metrics = {"loss_mat_reg": out["loss_mat_reg"]}
                for name, value in guidance_out.items():
                    if name.startswith("loss_"):
                        lam = loss_cfg.get(name.replace("loss_", "lambda_"), 1.0)
                        loss = loss + C_jax(lam, step) * value
                        metrics[name] = value
                metrics["loss"] = loss
                metrics["grad_norm"] = guidance_out.get("grad_norm", jnp.float32(0))
                metrics["min_step"] = guidance_out.get("min_step", jnp.int32(0))
                metrics["max_step"] = guidance_out.get("max_step", jnp.int32(0))
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["geo"])
            updates, new_opt = optimizer.update(grads, state["opt"], state["geo"])
            new_geo = optax.apply_updates(state["geo"], updates)
            return {"geo": new_geo, "opt": new_opt, "step": step + 1}, metrics

        return jax.jit(train_step)
