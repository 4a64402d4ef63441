"""Variational Score Distillation (ProlificDreamer) guidance.

TPU-native rebuild of the reference
(/root/reference/threestudio_dreammat/threestudio/models/guidance/
stable_diffusion_vsd_guidance.py:36-687): the SDS noise target is replaced
by a LoRA-adapted copy of the same UNet that is trained online to model the
current render distribution, conditioned on the camera through a class
embedding::

    grad      = w(t) * (eps_pretrained_cfg - eps_lora_cfg)     (:546-549)
    loss_lora = ||eps_lora(x_t', t', y, c2w) - noise'||^2      (:551-594)

Differences from the torch original, by design:

- **single-model**: the reference optionally loads a second SD pipe for the
  LoRA branch; here the LoRA branch *is* the same UNet with low-rank factors
  merged functionally (``diffusion/lora.py``) — the reference's
  ``single_model`` path (:100-105), which also means epsilon prediction for
  both branches (no v-prediction conversion needed, :524-534).
- the LoRA factors and the camera embedding are a small separate pytree the
  *system* owns and optimizes; the guidance is a pure function of
  ``(frozen params, lora params, batch)`` so the whole VSD step (both UNet
  passes + the LoRA regression) traces into one jitted train step. The
  torch original runs a second optimizer step outside autograd.
- the 10% camera-condition dropout for LoRA CFG training (:580-581) is a
  traced bernoulli on the step rng, not python ``random.random()``.

CFG anchoring note: unlike the CSD/SDS guidances (text-anchored, a
reference quirk), VSD uses the diffusers convention
``uncond + g * (text - uncond)`` on BOTH branches (:518-521, :541-544).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.models.diffusion import layers as L
from dreammat_tpu.models.diffusion import lora as lora_lib
from dreammat_tpu.models.diffusion.scheduler import add_noise
from dreammat_tpu.models.guidance_sds import StableDiffusionGuidance
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("stable-diffusion-vsd-guidance")
class StableDiffusionVSDGuidance(StableDiffusionGuidance):
    @dataclass
    class Config(StableDiffusionGuidance.Config):
        use_controlnet: bool = False
        guidance_scale: float = 7.5
        guidance_scale_lora: float = 1.0
        lora_rank: int = 4
        lora_cfg_training: bool = True
        lora_n_timestamp_samples: int = 1
        camera_condition_type: str = "extrinsics"  # | "mvp"

    cfg: Config

    # -- trainable side ------------------------------------------------------
    def init_lora(self, rng: jax.Array) -> Dict[str, Any]:
        """Trainable pytree: per-site low-rank factors + the camera class
        embedding (TimestepEmbedding(16 -> temb_dim), reference :154-158).
        Owned and optimized by the system, passed back into __call__."""
        assert self.params is not None, "init_params first"
        k1, k2 = jax.random.split(rng)
        layers = lora_lib.init_lora_params(k1, self.params["unet"], self.cfg.lora_rank)
        temb_dim = self.unet_cfg.block_out_channels[0] * 4
        cam_mod = L.TimestepEmbedding(temb_dim, dtype=self.dtype)
        cam = cam_mod.init(k2, jnp.zeros((1, 16), jnp.float32))
        dreammat_tpu.info(
            "VSD lora: %d sites, %d params (rank %d) + camera embedding",
            len(layers), lora_lib.lora_param_count(layers), self.cfg.lora_rank,
        )
        return {"layers": layers, "camera_embedding": cam["params"]}

    def _merged_unet_params(self, params, lora_params):
        """Frozen UNet weights + LoRA delta + grafted camera embedding.
        Differentiable in ``lora_params`` (both factors and embedding)."""
        merged = lora_lib.merge_lora(params["unet"], lora_params["layers"], 1.0)
        merged["params"] = dict(
            merged["params"], class_embedding=lora_params["camera_embedding"]
        )
        return merged

    def _lora_eps(self, merged, latents, t, emb_cond, cam):
        """One LoRA-branch eps prediction (camera-conditioned)."""
        return self.unet.apply(
            merged, latents, t, emb_cond, class_labels=cam
        )

    # -- VSD forward ---------------------------------------------------------
    def __call__(
        self,
        params: Dict,
        rgb: jnp.ndarray,
        prompt_utils,
        elevation: jnp.ndarray,
        azimuth: jnp.ndarray,
        camera_distances: jnp.ndarray,
        c2w: jnp.ndarray = None,
        lora_params: Dict = None,
        condition_map=None,
        step=0,
        rng: jax.Array = None,
        rgb_as_latents: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        assert c2w is not None and lora_params is not None
        if cfg.camera_condition_type != "extrinsics":
            raise NotImplementedError(
                "only camera_condition_type=extrinsics is supported "
                "(mvp needs the projection matrix in the batch)"
            )
        B = rgb.shape[0]
        k_enc, k_t, k_noise, k_tl, k_nl, k_drop = jax.random.split(rng, 6)
        sg = jax.lax.stop_gradient

        if rgb_as_latents:
            lh = rgb.shape[1] // self.vae_factor
            latents = jax.image.resize(rgb, (B, lh, lh, 4), method="linear")
        else:
            latents = self.encode_images(params, rgb, k_enc)

        min_pct = C_jax(cfg.min_step_percent, step)
        max_pct = C_jax(cfg.max_step_percent, step)
        min_step = jnp.round(self.num_train_timesteps * min_pct).astype(jnp.int32)
        max_step = jnp.round(self.num_train_timesteps * max_pct).astype(jnp.int32)
        u = jax.random.uniform(k_t, (B,))
        t = (min_step + u * (max_step - min_step + 1).astype(jnp.float32)).astype(jnp.int32)
        t = jnp.clip(t, 0, self.num_train_timesteps - 1)

        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = add_noise(self.schedule, latents, noise, t)

        cam = c2w.reshape(B, 16).astype(jnp.float32)
        merged = self._merged_unet_params(params, lora_params)

        # ---- pretrained branch: view-dependent prompts, diffusers CFG ----
        emb_vd = prompt_utils.get_text_embeddings(
            elevation, azimuth, camera_distances,
            view_dependent_prompting=cfg.view_dependent_prompting,
            return_null=False,
        )
        eps = sg(self.noise_pred(params, latents_noisy, t, emb_vd, None, [], 2))
        eps_text, eps_uncond = jnp.split(eps, 2, axis=0)
        eps_pretrain = eps_uncond + cfg.guidance_scale * (eps_text - eps_uncond)

        # ---- LoRA branch: view-independent cond prompt, camera CFG ----
        emb_vi = prompt_utils.get_text_embeddings(
            elevation, azimuth, camera_distances,
            view_dependent_prompting=False, return_null=False,
        )
        emb_cond = emb_vi[:B]
        latent_in = jnp.concatenate([latents_noisy] * 2, axis=0)
        t_in = jnp.concatenate([t] * 2, axis=0)
        cam_in = jnp.concatenate([cam, jnp.zeros_like(cam)], axis=0)
        eps_l = sg(self._lora_eps(
            merged, latent_in, t_in, jnp.concatenate([emb_cond] * 2, axis=0), cam_in
        ))
        eps_cam, eps_unc = jnp.split(eps_l, 2, axis=0)
        eps_est = eps_unc + cfg.guidance_scale_lora * (eps_cam - eps_unc)

        w = (1.0 - self.schedule["alphas_cumprod"][t]).reshape(-1, 1, 1, 1)
        grad = w * (eps_pretrain - eps_est)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip_val is not None:
            grad = jnp.clip(grad, -cfg.grad_clip_val, cfg.grad_clip_val)

        target = sg(latents - grad)
        loss_vsd = 0.5 * jnp.sum((latents - target) ** 2) / B

        # ---- LoRA regression on the current render distribution ----
        n_ts = cfg.lora_n_timestamp_samples
        lat_d = jnp.tile(sg(latents), (n_ts, 1, 1, 1))
        t2 = jax.random.randint(k_tl, (B * n_ts,), 0, self.num_train_timesteps)
        noise2 = jax.random.normal(k_nl, lat_d.shape)
        noisy2 = add_noise(self.schedule, lat_d, noise2, t2)
        cam_l = cam
        if cfg.lora_cfg_training:
            drop = jax.random.uniform(k_drop, (B, 1)) < 0.1
            cam_l = jnp.where(drop, 0.0, cam)
        eps_pred = self._lora_eps(
            merged, noisy2, t2,
            jnp.tile(emb_cond, (n_ts, 1, 1)), jnp.tile(cam_l, (n_ts, 1)),
        )
        loss_lora = jnp.mean((eps_pred.astype(jnp.float32) - noise2) ** 2)

        return {
            "loss_vsd": loss_vsd,
            "loss_lora": loss_lora,
            # alias so generic systems that scale loss_sds keep working
            "loss_sds": loss_vsd,
            "grad_norm": jnp.linalg.norm(grad),
            "min_step": min_step,
            "max_step": max_step,
        }
