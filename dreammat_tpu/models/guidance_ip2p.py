"""InstructPix2Pix guidance: text-instructed image editing for NeRF editing.

TPU-native rebuild of ``stable-diffusion-instructpix2pix-guidance``
(/root/reference/threestudio_dreammat/threestudio/models/guidance/
instructpix2pix_guidance.py:18-347): the IP2P UNet takes the noisy latent
channel-concatenated with the *conditioning image's* latent (8 input
channels) and runs THREE CFG replicas — [text+image, image-only, uncond]
— combined as ``uncond + g*(text - image) + s*(image - uncond)``
(:195-203). Two modes:

- ``use_sds=True``: the 3-way-CFG eps drives a standard SDS grad (:211-239);
- default (Instruct-NeRF2NeRF's mode): *iterative dataset update* — noise
  the rendered view to a random t, then DDIM-denoise ``diffusion_steps``
  steps conditioned on the ORIGINAL view and the instruction, returning
  decoded ``edit_images`` that replace the training target (:166-208).
  The reference mutates the scheduler's config per call and loops in
  python; here the t-dependent timestep ladder is computed with traced
  arithmetic and the denoise loop is a ``lax.scan`` — the whole edit is
  one jittable function.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.models.diffusion import convert
from dreammat_tpu.models.diffusion.scheduler import (
    SchedulerConfig, add_noise, make_schedule,
)
from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig
from dreammat_tpu.utils.base import BaseObject
from dreammat_tpu.utils.schedule import C_jax


def ip2p_unet_config() -> UNetConfig:
    """timbrooks/instruct-pix2pix: SD-1.5 UNet with 8 input channels."""
    return replace(
        UNetConfig.sd21(),
        in_channels=8,
        cross_attention_dim=768,
        use_linear_projection=False,
    )


@dreammat_tpu.register("stable-diffusion-instructpix2pix-guidance")
class InstructPix2PixGuidance(BaseObject):
    @dataclass
    class Config:
        cache_dir: Optional[str] = None
        ddim_scheduler_name_or_path: str = "CompVis/stable-diffusion-v1-4"
        ip2p_name_or_path: str = "timbrooks/instruct-pix2pix"
        guidance_scale: float = 7.5
        condition_scale: float = 1.5
        grad_clip: Optional[Any] = None
        half_precision_weights: bool = True
        fixed_size: int = -1
        min_step_percent: Any = 0.02
        max_step_percent: Any = 0.98
        diffusion_steps: int = 20
        use_sds: bool = False
        model_size: str = "ip2p"  # "ip2p" | "tiny" (tests / CI)
        # reference config parity (no-ops on TPU):
        enable_memory_efficient_attention: bool = False
        enable_sequential_cpu_offload: bool = False
        enable_attention_slicing: bool = False
        enable_channels_last_format: bool = False

    cfg: Config

    def configure(self) -> None:
        cfg = self.cfg
        self.dtype = jnp.bfloat16 if cfg.half_precision_weights else jnp.float32
        tiny = cfg.model_size == "tiny"
        self.unet_cfg = (
            replace(UNetConfig.tiny(), in_channels=8) if tiny else ip2p_unet_config()
        )
        self.vae_cfg = VAEConfig.tiny() if tiny else VAEConfig.sd()
        self.unet = UNet2DCondition(self.unet_cfg, dtype=self.dtype)
        self.vae = AutoencoderKL(self.vae_cfg, dtype=self.dtype)
        self.schedule = make_schedule(SchedulerConfig())
        self.num_train_timesteps = SchedulerConfig().num_train_timesteps
        self.params: Optional[Dict[str, Any]] = None

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae_cfg.block_out_channels) - 1)

    def init_params(self, rng: jax.Array, latent_hw=None) -> Dict[str, Any]:
        cfg = self.cfg
        if latent_hw is None:
            s = cfg.fixed_size if cfg.fixed_size > 0 else 256
            latent_hw = (s // self.vae_factor, s // self.vae_factor)
        h, w = latent_hw
        cross = self.unet_cfg.cross_attention_dim
        k1, k2 = jax.random.split(rng)
        f = self.vae_factor
        params = {
            "unet": convert.fast_random_init(
                k1, lambda: self.unet.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, h, w, 8)),
                    jnp.zeros((1,)), jnp.zeros((1, 4, cross)),
                )
            ),
            "vae": convert.fast_random_init(
                k2, lambda: self.vae.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, h * f, w * f, 3))
                )
            ),
        }
        import os

        if cfg.cache_dir and os.path.isdir(str(cfg.cache_dir)):
            for sub in ("unet", "vae"):
                d = os.path.join(cfg.cache_dir, sub)
                ckpt = convert.find_checkpoint_file(d) if os.path.isdir(d) else None
                if ckpt:
                    sd = convert.load_torch_state_dict(ckpt)
                    params[sub] = convert.torch_to_flax_params(
                        sd, params[sub], sub, strict=False
                    )
                    dreammat_tpu.info("loaded ip2p %s weights from %s", sub, ckpt)
        if cfg.half_precision_weights:
            params = convert.cast_float_leaves(params, jnp.bfloat16)
        self.params = params
        return params

    # ------------------------------------------------------------------
    def encode_images(self, params, rgb, rng):
        return self.vae.apply(
            params["vae"], rgb * 2.0 - 1.0, rng, method=self.vae.encode
        ).astype(jnp.float32)

    def decode_latents(self, params, latents):
        img = self.vae.apply(params["vae"], latents, method=self.vae.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0).astype(jnp.float32)

    def _cond_latents(self, params, cond_rgb):
        """[mode, mode, zeros] stack for the 3 CFG replicas (:146-155);
        posterior mean, UNSCALED (diffusers ip2p convention)."""
        mean, _ = self.vae.apply(
            params["vae"], cond_rgb * 2.0 - 1.0, method=self.vae.encode_moments
        )
        mean = mean.astype(jnp.float32)
        return jnp.concatenate([mean, mean, jnp.zeros_like(mean)], axis=0)

    def _eps3(self, params, latents, cond3, t, emb3):
        x = jnp.concatenate([latents] * 3, axis=0)
        x = jnp.concatenate([x, cond3], axis=-1)
        t3 = jnp.concatenate([t] * 3, axis=0)
        out = self.unet.apply(params["unet"], x, t3, emb3).astype(jnp.float32)
        e_text, e_img, e_unc = jnp.split(out, 3, axis=0)
        return (
            e_unc
            + self.cfg.guidance_scale * (e_text - e_img)
            + self.cfg.condition_scale * (e_img - e_unc)
        )

    def edit_latents(self, params, emb3, latents, cond3, t, rng):
        """Partial DDIM re-denoise from traced t (:166-208): the reference
        sets num_train_timesteps=t and re-derives 20 DDIM steps; here
        ts_i = round(t * (S - i) / S) with prev = ts_{i+1}, scanned."""
        S = self.cfg.diffusion_steps
        noise = jax.random.normal(rng, latents.shape)
        x = add_noise(self.schedule, latents, noise, t)
        tf = t.astype(jnp.float32)

        def ts_at(i):
            return jnp.round(tf * (S - i) / S).astype(jnp.int32)

        def body(x, i):
            ti = jnp.clip(ts_at(i), 0, self.num_train_timesteps - 1)
            tp = jnp.clip(ts_at(i + 1), 0, self.num_train_timesteps - 1)
            eps = self._eps3(params, x, cond3, ti, emb3)
            a_t = self.schedule["alphas_cumprod"][ti].reshape(-1, 1, 1, 1)
            a_p = jnp.where(
                ts_at(i + 1) >= 0,
                self.schedule["alphas_cumprod"][tp], 1.0
            ).reshape(-1, 1, 1, 1)
            x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            x = jnp.sqrt(a_p) * x0 + jnp.sqrt(1.0 - a_p) * eps
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(S))
        return x

    # ------------------------------------------------------------------
    def __call__(
        self,
        params: Dict,
        rgb: jnp.ndarray,        # [B,H,W,3] current render
        cond_rgb: jnp.ndarray,   # [B,H,W,3] original (unedited) view
        prompt_utils,
        step=0,
        rng: jax.Array = None,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B, H, W, _ = rgb.shape
        f = self.vae_factor
        if cfg.fixed_size > 0:
            RH = RW = cfg.fixed_size
        else:
            RH, RW = H // f * f, W // f * f
        k_enc, k_t, k_sds = jax.random.split(rng, 3)

        rgb_r = jax.image.resize(rgb, (B, RH, RW, 3), method="linear")
        cond_r = jax.image.resize(cond_rgb, (B, RH, RW, 3), method="linear")
        latents = self.encode_images(params, rgb_r, k_enc)
        cond3 = self._cond_latents(params, cond_r)

        # [positive, negative, negative] (:275-279)
        zero = jnp.zeros((B,))
        emb = prompt_utils.get_text_embeddings(
            zero, zero, zero, view_dependent_prompting=False, return_null=False
        )
        emb3 = jnp.concatenate([emb, emb[B:]], axis=0)

        min_pct = C_jax(cfg.min_step_percent, step)
        max_pct = C_jax(cfg.max_step_percent, step)
        min_step = jnp.round(self.num_train_timesteps * min_pct).astype(jnp.int32)
        max_step = jnp.round(self.num_train_timesteps * max_pct).astype(jnp.int32)
        u = jax.random.uniform(k_t, (B,))
        t = (min_step + u * (max_step - min_step + 1).astype(jnp.float32)).astype(jnp.int32)
        t = jnp.clip(t, 0, self.num_train_timesteps - 1)

        if cfg.use_sds:
            noise = jax.random.normal(k_sds, latents.shape)
            latents_noisy = add_noise(self.schedule, latents, noise, t)
            eps_cfg = jax.lax.stop_gradient(
                self._eps3(params, latents_noisy, cond3, t, emb3)
            )
            w = (1.0 - self.schedule["alphas_cumprod"][t]).reshape(-1, 1, 1, 1)
            grad = jnp.nan_to_num(w * (eps_cfg - noise))
            if cfg.grad_clip is not None:
                cv = C_jax(cfg.grad_clip, step)
                grad = jnp.clip(grad, -cv, cv)
            target = jax.lax.stop_gradient(latents - grad)
            loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / B
            return {
                "loss_sds": loss_sds,
                "grad_norm": jnp.linalg.norm(grad),
                "min_step": min_step,
                "max_step": max_step,
            }
        edit = self.edit_latents(params, emb3, latents, cond3, t, k_sds)
        imgs = self.decode_latents(params, edit)
        imgs = jax.image.resize(imgs, (B, H, W, 3), method="linear")
        return {"edit_images": imgs}
