"""Plain Stable-Diffusion SDS guidance (no ControlNet by default).

TPU-native rebuild of the reference's generic text-to-3D guidance
(/root/reference/threestudio_dreammat/threestudio/models/guidance/
stable_diffusion_guidance.py:21-296): classifier-free-guided eps
prediction, w(t) weighting strategies, SDS reparam loss. It is the
guidance texcraft-style systems plug in via ``guidance_type``
(reference systems/texcraft.py:44 takes the guidance type from config).

Shares the whole diffusion stack (UNet/VAE/scheduler/converter, optional
ControlNets) with the DreamMat guidance by subclassing it — only the grad
formula and the number of eps replicas differ:

    eps_cfg = eps_text + g * (eps_text - eps_uncond)      # sds guidance,
        (reference quirk: text-anchored CFG, stable_diffusion_guidance.py:
        256-258 — NOT uncond + g*(text-uncond))
    grad    = w(t) * (eps_cfg - noise)                     # :273-277
    w(t)    = 1 - alpha_cumprod(t)           ("sds",       :261-262)
            | 1                              ("uniform",    :263-264)
            | sqrt(a) * (1 - a)              ("fantasia3d", :265-268)

Perp-neg branch mirrors :203-235 (4 replicas, text-anchored accumulation).

``use_sjc=True`` switches to the Score-Jacobian-Chaining estimator
(:285-379, systems/sjc.py): sigma(t) = sqrt((1-a)/a), the latent is
perturbed ADDITIVELY (z = y + sigma*noise, scaled by 1/sqrt(1+sigma^2)
before the UNet — the variance-exploding view of the same schedule), the
denoised estimate D = z - sigma*eps_cfg, and

    grad = -(D - y) / sigma        (var_red=True, :365-368)
         | -(D - z) / sigma        (var_red=False)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.models.diffusion.scheduler import add_noise
from dreammat_tpu.models.guidance import StableDiffusionLightGuidance
from dreammat_tpu.utils.ops import perpendicular_component
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("stable-diffusion-guidance")
class StableDiffusionGuidance(StableDiffusionLightGuidance):
    @dataclass
    class Config(StableDiffusionLightGuidance.Config):
        use_controlnet: bool = False
        guidance_scale: float = 100.0
        weighting_strategy: str = "sds"  # "sds" | "uniform" | "fantasia3d"
        use_sjc: bool = False
        var_red: bool = True

    cfg: Config

    def _weight(self, t):
        a = self.schedule["alphas_cumprod"][t].reshape(-1, 1, 1, 1)
        ws = self.cfg.weighting_strategy
        if ws == "sds":
            return 1.0 - a
        if ws == "uniform":
            return jnp.ones_like(a)
        if ws == "fantasia3d":
            return jnp.sqrt(a) * (1.0 - a)
        raise ValueError(f"Unknown weighting strategy: {ws}")

    def __call__(
        self,
        params: Dict,
        rgb: jnp.ndarray,
        prompt_utils,
        elevation: jnp.ndarray,
        azimuth: jnp.ndarray,
        camera_distances: jnp.ndarray,
        condition_map=None,
        step=0,
        rng: jax.Array = None,
        rgb_as_latents: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B = rgb.shape[0]
        k_enc, k_t, k_noise = jax.random.split(rng, 3)

        if rgb_as_latents:
            if rgb.shape[-1] != 4:
                raise ValueError(f"rgb_as_latents expects 4 channels, got {rgb.shape}")
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
        if cfg.use_sjc:
            # variance-exploding perturbation (:285-357): z = y + sigma*n,
            # scaled to the VP frame before the UNet
            a = self.schedule["alphas_cumprod"][t].reshape(-1, 1, 1, 1)
            sigma = jnp.sqrt((1.0 - a) / a)
            zs = latents + sigma * noise
            latents_noisy = zs / jnp.sqrt(1.0 + sigma**2)
        else:
            latents_noisy = add_noise(self.schedule, latents, noise, t)

        image_cond = None
        scales = []
        if cfg.use_controlnet and condition_map is not None:
            # live depth/normal conditions (texcraft path) use the same
            # channel conventions as the parent (ch 0 depth, 1:4 normal)
            scales = self.condition_scales_at(step)
            image_cond = self._image_conditions(condition_map)

        sg = jax.lax.stop_gradient
        g = cfg.guidance_scale
        if prompt_utils.use_perp_neg:
            emb, neg_w = prompt_utils.get_text_embeddings_perp_neg(
                elevation, azimuth, camera_distances, return_null=False
            )
            eps = sg(self.noise_pred(params, latents_noisy, t, emb, image_cond, scales, 4))
            eps_text, eps_uncond = eps[:B], eps[B : 2 * B]
            eps_neg = eps[2 * B :]
            e_pos = eps_text - eps_uncond
            accum = jnp.zeros_like(e_pos)
            for i in range(2):
                e_i_neg = eps_neg[i * B : (i + 1) * B] - eps_uncond
                accum = accum + neg_w[:, i].reshape(-1, 1, 1, 1) * perpendicular_component(
                    e_i_neg, e_pos
                )
            eps_cfg = eps_text + g * (e_pos + accum)
        else:
            emb = prompt_utils.get_text_embeddings(
                elevation, azimuth, camera_distances,
                view_dependent_prompting=cfg.view_dependent_prompting,
                return_null=False,
            )
            eps = sg(self.noise_pred(params, latents_noisy, t, emb, image_cond, scales, 2))
            eps_text, eps_uncond = jnp.split(eps, 2, axis=0)
            eps_cfg = eps_text + g * (eps_text - eps_uncond)

        if cfg.use_sjc:
            Ds = zs - sigma * eps_cfg
            anchor = latents if cfg.var_red else zs
            grad = -(Ds - anchor) / sigma
        else:
            grad = self._weight(t) * (eps_cfg - noise)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip_val is not None:
            grad = jnp.clip(grad, -cfg.grad_clip_val, cfg.grad_clip_val)

        target = sg(latents - grad)
        loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / B
        return {
            "loss_sds": loss_sds,
            "grad_norm": jnp.linalg.norm(grad),
            "min_step": min_step,
            "max_step": max_step,
        }
