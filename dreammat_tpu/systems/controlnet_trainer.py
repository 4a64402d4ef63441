"""ControlNet training: pjit data-parallel epsilon-MSE fine-tuning.

Rebuild of the reference accelerate/DDP trainer
(/root/reference/controlnet_train/diffusers_train_controlnet.py:530-991):
frozen VAE/UNet/text-encoder, trainable ControlNet initialized from the
UNet's encoder weights (``from_unet`` semantics, line 638), per step:
VAE-encode target (861-863), sample t + add noise (866-874), CLIP-encode
prompts (877-880), ControlNet + UNet forward (884-901), eps-MSE (904-910),
AdamW step (912-918); periodic checkpoints and a DDIM validation grid
(106-173).

TPU-native: one jitted train step over a ``Mesh``; the batch shards over
the ``data`` axis and gradients all-reduce via the psum XLA inserts —
no NCCL, no accelerate.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dreammat_tpu
from dreammat_tpu.models.diffusion.clip_text import CLIPTextConfig, CLIPTextModel
from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
from dreammat_tpu.models.diffusion.scheduler import (
    SchedulerConfig, add_noise, ddim_step, ddim_timesteps, make_schedule,
)
from dreammat_tpu.models.diffusion.tokenizer import CLIPTokenizer
from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig
from dreammat_tpu.utils.base import BaseObject
from dreammat_tpu.utils.ckpt import load_checkpoint, save_checkpoint


def controlnet_params_from_unet(cnet_params: Dict, unet_params: Dict) -> Dict:
    """Copy the UNet's matching down/mid/time/conv_in weights into a freshly
    initialized ControlNet (ControlNetModel.from_unet semantics)."""
    import copy

    out = copy.deepcopy(jax.device_get(cnet_params))

    def merge(dst, src):
        for k, v in src.items():
            if k in dst:
                if isinstance(v, dict):
                    merge(dst[k], v)
                elif hasattr(v, "shape") and np.shape(dst[k]) == np.shape(v):
                    dst[k] = v

    merge(out["params"], unet_params["params"])
    return jax.tree_util.tree_map(jnp.asarray, out)


@dreammat_tpu.register("controlnet-trainer")
class ControlNetTrainer(BaseObject):
    @dataclass
    class Config:
        pretrained_model_name_or_path: str = "stabilityai/stable-diffusion-2-1-base"
        sd_cache_dir: Optional[str] = None
        controlnet_dir: str = "model/controlnet"
        resolution: int = 256
        train_batch_size: int = 32
        num_train_epochs: int = 3
        learning_rate: float = 1e-5
        adam_beta1: float = 0.9
        adam_beta2: float = 0.999
        adam_weight_decay: float = 1e-2
        adam_epsilon: float = 1e-8
        max_grad_norm: float = 1.0
        lr_scheduler: str = "constant"
        lr_warmup_steps: int = 500
        checkpointing_steps: int = 10000
        validation_steps: int = 1000
        num_validation_images: int = 4
        use_cfg: bool = False
        seed: int = 0
        scale_lr_by_world_size: bool = False  # accelerate's lr scaling (715-718)
        model_size: str = "sd21"  # "sd21" | "tiny"
        half_precision_weights: bool = True
        conditioning_channels: int = 22

    cfg: Config

    def configure(self) -> None:
        cfg = self.cfg
        tiny = cfg.model_size == "tiny"
        self.dtype = jnp.bfloat16 if (cfg.half_precision_weights and not tiny) else jnp.float32
        self.unet_cfg = UNetConfig.tiny() if tiny else UNetConfig.sd21()
        self.vae_cfg = VAEConfig.tiny() if tiny else VAEConfig.sd()
        self.clip_cfg = CLIPTextConfig.tiny() if tiny else CLIPTextConfig.sd21()
        self.unet = UNet2DCondition(self.unet_cfg, dtype=self.dtype)
        self.vae = AutoencoderKL(self.vae_cfg, dtype=self.dtype)
        self.clip = CLIPTextModel(self.clip_cfg, dtype=self.dtype)
        ccfg = ControlNetConfig(
            unet=self.unet_cfg,
            conditioning_channels=cfg.conditioning_channels,
            conditioning_embedding_channels=(16, 32) if tiny else (16, 32, 96, 256),
        )
        self.controlnet = ControlNet(ccfg, dtype=self.dtype)
        self.tokenizer = CLIPTokenizer(
            vocab_dir=os.path.join(cfg.sd_cache_dir, "tokenizer") if cfg.sd_cache_dir else None,
            max_length=self.clip_cfg.max_length,
            vocab_size=self.clip_cfg.vocab_size,
        )
        self.schedule = make_schedule(SchedulerConfig())

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae_cfg.block_out_channels) - 1)

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        cfg = self.cfg
        res = cfg.resolution
        lat = res // self.vae_factor
        cross = self.unet_cfg.cross_attention_dim
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        sample = jnp.zeros((1, lat, lat, 4))
        ctx = jnp.zeros((1, self.clip_cfg.max_length, cross))
        frozen = {
            "unet": self.unet.init(k1, sample, jnp.zeros((1,)), ctx),
            "vae": self.vae.init(k2, jnp.zeros((1, res, res, 3))),
            "clip": self.clip.init(k3, jnp.zeros((1, self.clip_cfg.max_length), jnp.int32)),
        }
        stem = 2 ** (len(self.controlnet.cfg.conditioning_embedding_channels) - 1)
        cond = jnp.zeros((1, lat * stem, lat * stem, cfg.conditioning_channels))
        cnet = self.controlnet.init(k4, sample, jnp.zeros((1,)), ctx, cond)

        # load pretrained SD when available
        from dreammat_tpu.models.diffusion import convert

        if cfg.sd_cache_dir and os.path.isdir(cfg.sd_cache_dir):
            for sub, mtype in (("unet", "unet"), ("vae", "vae"), ("text_encoder", "clip")):
                d = os.path.join(cfg.sd_cache_dir, sub)
                ckpt = convert.find_checkpoint_file(d) if os.path.isdir(d) else None
                if ckpt:
                    sd = convert.load_torch_state_dict(ckpt)
                    key = "clip" if mtype == "clip" else sub
                    frozen[key] = convert.torch_to_flax_params(sd, frozen[key], mtype, strict=False)
                    dreammat_tpu.info("loaded %s from %s", sub, ckpt)
        # ControlNetModel.from_unet: seed trainable weights from the UNet
        cnet = controlnet_params_from_unet(cnet, frozen["unet"])
        return {"frozen": frozen, "controlnet": cnet}

    # ------------------------------------------------------------------
    def make_train_step(self, mesh=None):
        cfg = self.cfg
        tx_chain = [optax.clip_by_global_norm(cfg.max_grad_norm)]
        lr = cfg.learning_rate
        if cfg.lr_scheduler == "constant_with_warmup":
            lr = optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps)
        tx_chain.append(
            optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                        eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay)
        )
        self.tx = optax.chain(*tx_chain)

        def train_step(cnet_params, opt_state, frozen, batch, rng):
            k_enc, k_t, k_noise = jax.random.split(rng, 3)
            latents = self.vae.apply(
                frozen["vae"], batch["target"] * 2.0 - 1.0, k_enc, method=self.vae.encode
            ).astype(jnp.float32)
            B = latents.shape[0]
            t = jax.random.randint(k_t, (B,), 0, self.schedule["alphas_cumprod"].shape[0])
            noise = jax.random.normal(k_noise, latents.shape)
            noisy = add_noise(self.schedule, latents, noise, t)
            ctx = self.clip.apply(frozen["clip"], batch["input_ids"]).astype(jnp.float32)

            def loss_fn(cp):
                down, mid = self.controlnet.apply(
                    cp, noisy, t, ctx, batch["condition"], 1.0
                )
                eps = self.unet.apply(
                    frozen["unet"], noisy, t, ctx,
                    down_block_additional_residuals=down,
                    mid_block_additional_residual=mid,
                )
                return jnp.mean((eps - noise) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(cnet_params)
            updates, new_opt = self.tx.update(grads, opt_state, cnet_params)
            new_params = optax.apply_updates(cnet_params, updates)
            return new_params, new_opt, {"loss": loss}

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            # frozen params keep whatever placement the caller chose (e.g.
            # tensor-parallel shardings from parallel.mesh.tp_shard_params)
            return jax.jit(
                train_step,
                in_shardings=(repl, repl, None,
                              {"target": batch_sh, "input_ids": batch_sh, "condition": batch_sh},
                              repl),
                out_shardings=(repl, repl, repl),
            )
        return jax.jit(train_step)

    # ------------------------------------------------------------------
    def fit(self, dataset, out_dir: str, mesh=None, max_steps: Optional[int] = None,
            log_every: int = 10) -> Dict[str, Any]:
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        k_init, rng = jax.random.split(rng)
        params = self.init_params(k_init)
        step_fn = self.make_train_step(mesh)
        opt_state = self.tx.init(params["controlnet"])
        cnet = params["controlnet"]
        frozen = params["frozen"]

        os.makedirs(out_dir, exist_ok=True)
        step = 0
        t0 = time.time()
        for batch in dataset.batches(cfg.train_batch_size, epochs=cfg.num_train_epochs):
            ids = jnp.asarray(self.tokenizer.batch(batch["prompts"]))
            jb = {
                "target": jnp.asarray(batch["target"], dtype=jnp.float32),
                "input_ids": ids,
                "condition": jnp.asarray(batch["condition"], dtype=jnp.float32),
            }
            rng, k = jax.random.split(rng)
            cnet, opt_state, metrics = step_fn(cnet, opt_state, frozen, jb, k)
            step += 1
            if step % log_every == 0:
                dreammat_tpu.info(
                    "controlnet step %d loss=%.5f (%.2f it/s)",
                    step, float(metrics["loss"]), step / (time.time() - t0),
                )
            if cfg.checkpointing_steps and step % cfg.checkpointing_steps == 0:
                save_checkpoint(os.path.join(out_dir, f"checkpoint-{step}"), cnet, step)
            if max_steps and step >= max_steps:
                break

        # final save: our ckpt + diffusers-layout export for interchangeability
        save_checkpoint(os.path.join(out_dir, "controlnet_final"), cnet, step)
        self.export_diffusers(cnet, os.path.join(out_dir, "controlnet"))
        return {"controlnet": cnet, "frozen": frozen, "step": step}

    def export_diffusers(self, cnet_params, out_dir: str) -> str:
        """Write safetensors in diffusers ControlNet layout so the torch
        reference can consume TPU-trained weights."""
        from safetensors.numpy import save_file

        from dreammat_tpu.models.diffusion import convert

        os.makedirs(out_dir, exist_ok=True)
        sd = convert.flax_to_torch_state_dict(cnet_params, "controlnet")
        path = os.path.join(out_dir, "diffusion_pytorch_model.safetensors")
        save_file({k: np.asarray(v) for k, v in sd.items()}, path)
        return path

    # ------------------------------------------------------------------
    def validate(self, params, batch, n_steps: int = 20, rng=None) -> np.ndarray:
        """DDIM sample conditioned on a validation batch; returns [B,H,W,3]
        (log_validation, diffusers_train_controlnet.py:106-173)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        frozen = params["frozen"]
        cnet = params["controlnet"]
        ids = jnp.asarray(self.tokenizer.batch(batch["prompts"]))
        ctx = self.clip.apply(frozen["clip"], ids).astype(jnp.float32)
        uncond_ids = jnp.asarray(self.tokenizer.batch([""] * len(batch["prompts"])))
        uctx = self.clip.apply(frozen["clip"], uncond_ids).astype(jnp.float32)
        B = ids.shape[0]
        lat = self.cfg.resolution // self.vae_factor
        x = jax.random.normal(rng, (B, lat, lat, 4))
        cond = jnp.asarray(batch["condition"], dtype=jnp.float32)
        ts = ddim_timesteps(1000, n_steps)
        guidance_scale = 7.5
        for i, t in enumerate(ts):
            tb = jnp.full((B,), int(t))
            down, mid = self.controlnet.apply(cnet, x, tb, ctx, cond, 1.0)
            eps_c = self.unet.apply(frozen["unet"], x, tb, ctx,
                                    down_block_additional_residuals=down,
                                    mid_block_additional_residual=mid)
            eps_u = self.unet.apply(frozen["unet"], x, tb, uctx)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
            x = ddim_step(self.schedule, x, eps, tb, jnp.full((B,), t_prev))
        img = self.vae.apply(frozen["vae"], x, method=self.vae.decode)
        return np.asarray(jnp.clip(img * 0.5 + 0.5, 0, 1))
