"""Noise schedules: DDPM forward process + DDIM sampling (pure JAX).

From-scratch equivalent of the diffusers ``DDPMScheduler``/``DDIMScheduler``
used by the reference (dreammat_guidance.py:148-154, 454-463;
controlnet_train/diffusers_train_controlnet.py:866-874). SD2.x:
scaled_linear betas 0.00085 -> 0.012 over 1000 steps, epsilon prediction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"


def make_schedule(cfg: SchedulerConfig = SchedulerConfig()):
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps) ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps)
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        # cosine schedule (diffusers betas_for_alpha_bar) — DeepFloyd-IF's
        # DDPMScheduler config
        T = cfg.num_train_timesteps

        def abar(s):
            return np.cos((s + 0.008) / 1.008 * np.pi / 2) ** 2

        i = np.arange(T, dtype=np.float64)
        betas = np.minimum(1.0 - abar((i + 1) / T) / abar(i / T), 0.999)
    else:
        raise ValueError(cfg.beta_schedule)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return {
        "betas": jnp.asarray(betas, dtype=jnp.float32),
        "alphas": jnp.asarray(alphas, dtype=jnp.float32),
        "alphas_cumprod": jnp.asarray(alphas_cumprod, dtype=jnp.float32),
    }


def add_noise(schedule, samples: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) eps. t: [B] int."""
    a = schedule["alphas_cumprod"][t]
    shape = (-1,) + (1,) * (samples.ndim - 1)
    sa = jnp.sqrt(a).reshape(shape)
    sb = jnp.sqrt(1.0 - a).reshape(shape)
    return sa * samples + sb * noise


def pred_x0_from_eps(schedule, x_t, eps, t):
    a = schedule["alphas_cumprod"][t]
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    sa = jnp.sqrt(a).reshape(shape)
    sb = jnp.sqrt(1.0 - a).reshape(shape)
    return (x_t - sb * eps) / sa


def ddim_step(schedule, x_t, eps, t, t_prev, eta: float = 0.0):
    """One deterministic DDIM step t -> t_prev (eta=0)."""
    a_t = schedule["alphas_cumprod"][t]
    a_prev = jnp.where(t_prev >= 0, schedule["alphas_cumprod"][jnp.maximum(t_prev, 0)], 1.0)
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    a_t = a_t.reshape(shape)
    a_prev = a_prev.reshape(shape)
    x0 = (x_t - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev) * eps
    return jnp.sqrt(a_prev) * x0 + dir_xt


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Descending timestep sequence for DDIM sampling."""
    step = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(np.int64)
    return ts
