"""Score-distillation guidance: SD2.1 + light-aware ControlNet CSD loss.

TPU-native rebuild of ``StableDiffusionLightGuidance``
(/root/reference/threestudio_dreammat/threestudio/models/guidance/
dreammat_guidance.py:43-627). Loss formulation preserved exactly:

    grad = w(t) * (cond_scale * eps_text + uncond_scale * eps_uncond
                   + null_scale * eps_null + noise_scale * noise
                   [+ perpneg_scale * eps_perpneg])
    loss = 0.5 * ||latents - stop_grad(latents - grad)||^2 / B
    (compute_grad_sds 440-497, reparam trick 591-594)

with step-scheduled scales (update_step 609-626) evaluated *inside jit* via
``C_jax``, the 3x (or 5x perp-neg) batched ControlNet+UNet forward, the
timestep-window annealing (set_min_max_steps 604-607), and the ControlNet
condition-scale anneal (621-626). Weights are frozen; everything runs in one
traced function so XLA fuses the whole denoise into MXU work.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.models.diffusion import convert
from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
from dreammat_tpu.models.diffusion.scheduler import SchedulerConfig, add_noise, make_schedule
from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig
from dreammat_tpu.models.prompt import PromptEmbeddings
from dreammat_tpu.utils.base import BaseObject
from dreammat_tpu.utils.ops import perpendicular_component
from dreammat_tpu.utils.schedule import C_jax


@dreammat_tpu.register("stable-diffusion-dreammat-guidance")
class StableDiffusionLightGuidance(BaseObject):
    @dataclass
    class Config:
        width: int = 512
        height: int = 512
        cache_dir: Optional[str] = "model"
        pretrained_model_name_or_path: str = "stabilityai/stable-diffusion-2-1-base"
        controlnet_path: Optional[str] = "model/controlnet"
        half_precision_weights: bool = True
        use_controlnet: bool = True
        control_types: List = field(default_factory=lambda: ["light"])
        condition_scales: List = field(default_factory=lambda: [1.0])
        condition_scales_anneal: List = field(default_factory=lambda: [1.0])
        control_anneal_start_step: Optional[int] = None
        control_anneal_end_scale: Optional[float] = None
        min_step_percent: Any = 0.02
        max_step_percent: Any = 0.98
        cond_scale: Any = 1.0
        uncond_scale: Any = 0.0
        null_scale: Any = -1.0
        noise_scale: Any = 0.0
        perpneg_scale: Any = 0.0
        view_dependent_prompting: bool = True
        grad_clip_val: Optional[float] = None
        grad_normalize: bool = False
        model_size: str = "sd21"  # "sd21" | "tiny" (tests / CI)
        # accepted for reference config parity (no-ops on TPU):
        enable_memory_efficient_attention: bool = False
        enable_sequential_cpu_offload: bool = False
        enable_attention_slicing: bool = False
        enable_channels_last_format: bool = False

    cfg: Config

    def configure(self) -> None:
        cfg = self.cfg
        self.dtype = jnp.bfloat16 if cfg.half_precision_weights else jnp.float32
        tiny = cfg.model_size == "tiny"
        self.unet_cfg = UNetConfig.tiny() if tiny else UNetConfig.sd21()
        self.vae_cfg = VAEConfig.tiny() if tiny else VAEConfig.sd()
        self.unet = UNet2DCondition(self.unet_cfg, dtype=self.dtype)
        self.vae = AutoencoderKL(self.vae_cfg, dtype=self.dtype)
        self.controlnets = []
        if cfg.use_controlnet:
            # subclasses (triple guidance) extend the control-type set
            cn_channels = getattr(
                self, "_cn_channels", {"light": 22, "depth": 3, "normal": 3}
            )
            for ct in cfg.control_types:
                ccfg = ControlNetConfig(
                    unet=self.unet_cfg,
                    conditioning_channels=cn_channels[ct],
                    conditioning_embedding_channels=(16, 32) if tiny else (16, 32, 96, 256),
                )
                self.controlnets.append(ControlNet(ccfg, dtype=self.dtype))

        self.schedule = make_schedule(SchedulerConfig())
        self.num_train_timesteps = SchedulerConfig().num_train_timesteps
        self.params: Optional[Dict[str, Any]] = None

    # ------------------------------------------------------------------
    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae_cfg.block_out_channels) - 1)

    def init_params(self, rng: jax.Array, latent_hw: Optional[Tuple[int, int]] = None) -> Dict[str, Any]:
        """Random-init all frozen diffusion weights, then overwrite from
        local checkpoints when present (reference configure, 88-202)."""
        cfg = self.cfg
        if latent_hw is None:
            latent_hw = (cfg.height // self.vae_factor, cfg.width // self.vae_factor)
        h, w = latent_hw
        cross = self.unet_cfg.cross_attention_dim
        k1, k2, k3 = jax.random.split(rng, 3)
        sample = jnp.zeros((1, h, w, 4))
        t = jnp.zeros((1,))
        ctx = jnp.zeros((1, 4, cross))
        params: Dict[str, Any] = {}
        # eval_shape-based init: no forward-pass compile for frozen weights
        params["unet"] = convert.fast_random_init(
            k1, lambda: self.unet.init(jax.random.PRNGKey(0), sample, t, ctx)
        )
        f = 2 ** (len(self.vae_cfg.block_out_channels) - 1)
        params["vae"] = convert.fast_random_init(
            k2, lambda: self.vae.init(jax.random.PRNGKey(0), jnp.zeros((1, h * f, w * f, 3)))
        )
        params["controlnets"] = []
        for i, cnet in enumerate(self.controlnets):
            # the conditioning stem downsamples 2^(len(channels)-1); condition
            # maps enter at latent_res * that factor
            stem = 2 ** (len(cnet.cfg.conditioning_embedding_channels) - 1)
            cond = jnp.zeros((1, h * stem, w * stem, cnet.cfg.conditioning_channels))
            params["controlnets"].append(
                convert.fast_random_init(
                    jax.random.fold_in(k3, i),
                    lambda cnet=cnet, cond=cond: cnet.init(
                        jax.random.PRNGKey(0), sample, t, ctx, cond
                    ),
                )
            )

        # load real weights when available
        if cfg.cache_dir and os.path.isdir(str(cfg.cache_dir)):
            for sub, key, mtype in (
                ("unet", "unet", "unet"),
                ("vae", "vae", "vae"),
            ):
                d = os.path.join(cfg.cache_dir, sub)
                ckpt = convert.find_checkpoint_file(d) if os.path.isdir(d) else None
                if ckpt:
                    sd = convert.load_torch_state_dict(ckpt)
                    params[key] = convert.torch_to_flax_params(sd, params[key], mtype, strict=False)
                    dreammat_tpu.info("loaded %s weights from %s", key, ckpt)
        if cfg.use_controlnet and cfg.controlnet_path and os.path.isdir(str(cfg.controlnet_path)):
            ckpt = convert.find_checkpoint_file(cfg.controlnet_path)
            if ckpt:
                sd = convert.load_torch_state_dict(ckpt)
                params["controlnets"][0] = convert.torch_to_flax_params(
                    sd, params["controlnets"][0], "controlnet", strict=False
                )
                dreammat_tpu.info("loaded controlnet weights from %s", ckpt)
        if cfg.half_precision_weights:
            params = convert.cast_float_leaves(params, jnp.bfloat16)
        self.params = params
        return params

    # ------------------------------------------------------------------
    # traced pieces
    # ------------------------------------------------------------------
    def encode_images(self, params, rgb_bhwc: jnp.ndarray, rng) -> jnp.ndarray:
        """[B,H,W,3] in [0,1] -> scaled latents (encode_images, 284-292)."""
        x = rgb_bhwc * 2.0 - 1.0
        return self.vae.apply(params["vae"], x, rng, method=self.vae.encode).astype(jnp.float32)

    def decode_latents(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        img = self.vae.apply(params["vae"], latents, method=self.vae.decode)
        return jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

    def multi_control_forward(self, params, sample, t, ctx, image_cond: List, scales: List):
        """Sum residuals over controlnets (multi_control_forward, 205-241)."""
        down_acc, mid_acc = None, None
        for cnet, cparams, cond, scale in zip(
            self.controlnets, params["controlnets"], image_cond, scales
        ):
            down, mid = cnet.apply(cparams, sample, t, ctx, cond, scale)
            if down_acc is None:
                down_acc, mid_acc = list(down), mid
            else:
                down_acc = [a + b for a, b in zip(down_acc, down)]
                mid_acc = mid_acc + mid
        return down_acc, mid_acc

    def noise_pred(self, params, latents_noisy, t, text_embeddings, image_cond, scales, n_copies: int):
        """Batched eps prediction on n_copies replicas of the latent."""
        latent_in = jnp.concatenate([latents_noisy] * n_copies, axis=0)
        t_in = jnp.concatenate([t] * n_copies, axis=0)
        if image_cond is not None:
            # the CFG replicas share ONE condition stack — keep it batch-1:
            # the ControlNet's image-resolution conditioning stem (the
            # lowest-MFU convs of the whole step, 512^2 at 16-96 channels)
            # then runs once instead of n_copies times, and its latent-res
            # output broadcasts over the replica batch in `x + cond`. The
            # broadcast only holds for condition batch 1; with data batch
            # B>1 the stem must be replicated to match latent_in's B*n_copies
            # (the stem dedup is a batch-1 fast path, not a general rewrite).
            image_cond = [
                c if c.shape[0] == 1 else jnp.concatenate([c] * n_copies, axis=0)
                for c in image_cond
            ]
            down, mid = self.multi_control_forward(
                params, latent_in, t_in, text_embeddings, image_cond, scales)
        else:
            down, mid = None, None
        return self.unet.apply(
            params["unet"], latent_in, t_in, text_embeddings,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
        )

    def _image_conditions(self, condition_map, rgb=None):
        """Per control type: 'light' consumes the 22-ch stack; 'depth' and
        'normal' reuse slices of it (channels 0 and 1:4). Resizes to guidance
        res; grayscale -> 3ch for depth controlnets (prepare_image_cond,
        dreammat_guidance.py:518-534). ``rgb`` is the rendered image, used
        by render-derived control types (triple guidance's canny)."""
        cfg = self.cfg
        if condition_map is None:
            return None

        def prep(cond, want_channels=None):
            if want_channels == 3 and cond.shape[-1] == 1:
                cond = jnp.repeat(cond, 3, axis=-1)
            if cond.shape[1] != cfg.height or cond.shape[2] != cfg.width:
                cond = jax.image.resize(
                    cond, (cond.shape[0], cfg.height, cfg.width, cond.shape[-1]),
                    method="linear",
                )
            return cond

        image_cond = []
        for ct in cfg.control_types:
            if ct == "light":
                image_cond.append(prep(condition_map))
            elif ct == "depth":
                image_cond.append(prep(condition_map[..., 0:1], want_channels=3))
            elif ct == "normal":
                image_cond.append(prep(condition_map[..., 1:4]))
            else:
                raise ValueError(f"unsupported control type {ct}")
        return image_cond

    def condition_scales_at(self, step) -> List:
        cfg = self.cfg
        scales = []
        for i, s in enumerate(cfg.condition_scales):
            s_ann = cfg.condition_scales_anneal[i] if i < len(cfg.condition_scales_anneal) else s
            if cfg.control_anneal_start_step is None:
                scales.append(jnp.asarray(s, dtype=jnp.float32))
            else:
                scales.append(
                    jnp.where(step > cfg.control_anneal_start_step, s_ann, s).astype(jnp.float32)
                )
        return scales

    def __call__(
        self,
        params: Dict[str, Any],
        rgb: jnp.ndarray,                    # [B,H,W,3] rendered image, [0,1]
        prompt_utils: PromptEmbeddings,
        elevation: jnp.ndarray,              # [B] deg
        azimuth: jnp.ndarray,                # [B] deg
        camera_distances: jnp.ndarray,       # [B]
        condition_map: Optional[jnp.ndarray],  # [B,H,W,22]
        step,                                # traced global step
        rng: jax.Array,
        rgb_as_latents: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B = rgb.shape[0]
        k_enc, k_t, k_noise = jax.random.split(rng, 3)

        if rgb_as_latents:
            # input must already be a 4-channel latent image (reference
            # dreammat_guidance.py:543-549 interpolates it to latent res);
            # a 3-channel RGB with rgb_as_latents=True is a caller bug
            if rgb.shape[-1] != 4:
                raise ValueError(
                    f"rgb_as_latents=True expects 4 latent channels, got {rgb.shape}"
                )
            lh = rgb.shape[1] // 8 if cfg.model_size != "tiny" else rgb.shape[1] // 2
            latents = jax.image.resize(rgb, (B, lh, lh, 4), method="linear")
        else:
            latents = self.encode_images(params, rgb, k_enc)

        # scheduled scalar hyperparameters, traced on step
        cond_scale = C_jax(cfg.cond_scale, step)
        uncond_scale = C_jax(cfg.uncond_scale, step)
        null_scale = C_jax(cfg.null_scale, step)
        noise_scale = C_jax(cfg.noise_scale, step)
        perpneg_scale = C_jax(cfg.perpneg_scale, step)
        min_pct = C_jax(cfg.min_step_percent, step)
        max_pct = C_jax(cfg.max_step_percent, step)
        # round to match python-side int(num_timesteps * pct) without f32
        # truncation surprises (0.02*1000 -> 19.999)
        min_step = jnp.round(self.num_train_timesteps * min_pct).astype(jnp.int32)
        max_step = jnp.round(self.num_train_timesteps * max_pct).astype(jnp.int32)

        # uniform over the traced [min_step, max_step] window
        u = jax.random.uniform(k_t, (B,))
        t = (min_step + (u * (max_step - min_step + 1).astype(jnp.float32))).astype(jnp.int32)
        t = jnp.clip(t, 0, self.num_train_timesteps - 1)
        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = add_noise(self.schedule, latents, noise, t)

        scales = self.condition_scales_at(step) if cfg.use_controlnet else []
        image_cond = (
            self._image_conditions(condition_map, rgb=rgb)
            if cfg.use_controlnet else None
        )

        sg = jax.lax.stop_gradient
        if prompt_utils.use_perp_neg:
            text_embeddings, neg_w = prompt_utils.get_text_embeddings_perp_neg(
                elevation, azimuth, camera_distances, return_null=True
            )
            eps = sg(self.noise_pred(params, latents_noisy, t, text_embeddings, image_cond, scales, 5))
            eps_text = eps[:B]
            eps_uncond = eps[B : 2 * B]
            eps_neg = eps[2 * B : 4 * B]
            eps_null = eps[4 * B :]
            e_pos = eps_text - eps_uncond
            accum = jnp.zeros_like(e_pos)
            for i in range(2):
                e_i_neg = eps_neg[i::2] - eps_uncond
                accum = accum + neg_w[:, i].reshape(-1, 1, 1, 1) * perpendicular_component(
                    e_i_neg, e_pos
                )
            eps_perpneg = accum
        else:
            text_embeddings = prompt_utils.get_text_embeddings(
                elevation, azimuth, camera_distances,
                view_dependent_prompting=cfg.view_dependent_prompting, return_null=True,
            )
            eps = sg(self.noise_pred(params, latents_noisy, t, text_embeddings, image_cond, scales, 3))
            eps_text, eps_uncond, eps_null = jnp.split(eps, 3, axis=0)
            eps_perpneg = None

        w = (1.0 - self.schedule["alphas_cumprod"][t]).reshape(-1, 1, 1, 1)
        grad = w * (
            cond_scale * eps_text
            + uncond_scale * eps_uncond
            + null_scale * eps_null
            + noise_scale * noise
        )
        if eps_perpneg is not None:
            grad = grad + w * perpneg_scale * eps_perpneg

        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip_val is not None:
            grad = jnp.clip(grad, -cfg.grad_clip_val, cfg.grad_clip_val)
        if cfg.grad_normalize:
            grad = grad / (jnp.linalg.norm(grad) + 1e-8)

        target = sg(latents - grad)
        loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / B

        return {
            "loss_sds": loss_sds,
            "grad_norm": jnp.linalg.norm(grad),
            "uncond_m_noise_norm": jnp.linalg.norm(eps_uncond - noise),
            "text_m_noise_norm": jnp.linalg.norm(eps_text - noise),
            "text_m_uncond_norm": jnp.linalg.norm(eps_text - eps_uncond),
            "text_m_null_norm": jnp.linalg.norm(eps_text - eps_null),
            "null_m_uncond_norm": jnp.linalg.norm(eps_null - eps_uncond),
            "noise_norm": jnp.linalg.norm(noise),
            "uncond_norm": jnp.linalg.norm(eps_uncond),
            "text_norm": jnp.linalg.norm(eps_text),
            "min_step": min_step,
            "max_step": max_step,
        }
