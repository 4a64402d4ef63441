"""GAN volume renderer (Control4D): low-res NeRF + conv super-resolution.

TPU-native rebuild of ``gan-volume-renderer``
(/root/reference/threestudio_dreammat/threestudio/models/renderers/
gan_volume_renderer.py:19-159): the base volume renderer draws a
low-resolution feature image — 3 RGB channels plus a latent tail
(``hybrid-rgb-latent-material``) — and a conv generator upsamples it
4x conditioned on a global appearance code; a PatchGAN discriminator
(trained by the system) scores the result. Three "generator levels"
choose where the codes come from (:119-135): 0 = self (lr render),
1 = gt global code, 2 = gt global + gt local latent.

Functional mapping: the reference keeps the GAN networks as renderer
submodules; here they are pure flax modules whose params live in a pytree
created by ``init_params`` and OWNED BY THE SYSTEM state (two optimizers:
generator-side and discriminator). ``generator_level`` and the
multi-level ray offsets are host-sampled per step; the level is a static
jit arg (3 cached variants), offsets are traced ``dynamic_slice`` starts
over stride-8 grids — fixed shapes throughout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.utils import gan
from dreammat_tpu.utils.base import BaseObject


@dreammat_tpu.register("gan-volume-renderer")
class GANVolumeRenderer(BaseObject):
    @dataclass
    class Config:
        base_renderer_type: str = "nerf-volume-renderer"
        base_renderer: Any = None
        ch: int = 64
        local_ch: int = 32
        ch_mult: Any = (1, 2, 4)
        z_channels: int = 4
        global_dim: int = 64
        disc_ndf: int = 64
        disc_layers: int = 3
        # mirrored base knobs for the system hooks
        estimator: str = "none"
        grid_prune: bool = False
        grid_update_every: int = 0

    cfg: Config
    is_volume: bool = True

    def __init__(self, cfg, geometry, material, background) -> None:
        self.geometry = geometry
        self.material = material
        self.background = background
        super().__init__(cfg)

    def configure(self) -> None:
        cfg = self.cfg
        self.base = dreammat_tpu.find(cfg.base_renderer_type)(
            cfg.base_renderer or {}, self.geometry, self.material,
            self.background,
        )
        for k in ("estimator", "grid_prune", "grid_update_every"):
            setattr(self.cfg, k, getattr(self.base.cfg, k, None))
        self.scale = 2 ** (len(tuple(cfg.ch_mult)) - 1)
        self.generator = gan.Generator(
            ch=cfg.ch, ch_mult=tuple(cfg.ch_mult), out_ch=3
        )
        self.local_encoder = gan.LocalEncoder(
            ch=cfg.local_ch, ch_mult=tuple(cfg.ch_mult),
            z_channels=cfg.z_channels,
        )
        self.global_encoder = gan.GlobalEncoder(n_class=cfg.global_dim)
        self.discriminator = gan.NLayerDiscriminator(
            ndf=cfg.disc_ndf, n_layers=cfg.disc_layers
        )
        self.mesh = None

    # -- params / state ------------------------------------------------------
    def init_state(self, rng):
        return self.base.init_state(rng)

    def update_occ(self, geo_params, state, rng):
        return self.base.update_occ(geo_params, state, rng)

    def init_params(self, rng: jax.Array, height: int, width: int) -> Dict[str, Any]:
        cfg = self.cfg
        hl, wl = height // self.scale, width // self.scale
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        return {
            "generator": self.generator.init(
                k1, jnp.zeros((1, hl, wl, 3 + cfg.z_channels)),
                jnp.zeros((1, cfg.global_dim)),
            ),
            "local_encoder": self.local_encoder.init(
                k2, jnp.zeros((1, height, width, 3))
            ),
            "global_encoder": self.global_encoder.init(
                k3, jnp.zeros((1, height, width, 3))
            ),
            "discriminator": self.discriminator.init(
                k4, jnp.zeros((1, height, width, 3))
            ),
        }

    def disc_apply(self, disc_params, img):
        return self.discriminator.apply(disc_params, img)

    # -- rendering -----------------------------------------------------------
    def render_rays(
        self, geo_params, bg_params, state, rays_o, rays_d, light_positions,
        rng, step=0, is_train: bool = False, gan_params=None, gt_rgb=None,
        generator_level: int = 0, int_offsets=None, height: int = 0,
        width: int = 0,
    ) -> Dict[str, Any]:
        """Full GAN render. ``height/width`` are the FULL-res dims of the
        flat ray grid; the base renders at height//scale (strided rays)."""
        cfg = self.cfg
        H, W = height, width
        s = self.scale
        k_base, k_z, k_int = jax.random.split(rng, 3)

        go = rays_o.reshape(H, W, 3)
        gd = rays_d.reshape(H, W, 3)
        gl = light_positions.reshape(H, W, 3)
        sub = lambda a: a[s // 2 :: s, s // 2 :: s].reshape(-1, 3)
        out = self.base.render_rays(
            geo_params, bg_params, state, sub(go), sub(gd), sub(gl),
            k_base, step=step, is_train=is_train,
        )
        Hl = len(range(s // 2, H, s))
        Wl = len(range(s // 2, W, s))
        feat = out["comp_rgb"].reshape(1, Hl, Wl, -1)
        lr_rgb = feat[..., :3]
        latent = feat[..., 3:]               # [1,Hl,Wl,2*z]
        out["comp_lr_rgb"] = lr_rgb[0].reshape(-1, 3)

        if is_train and gt_rgb is not None:
            z_map = gan.gaussian_sample(latent, k_z)
        else:
            z_map, _ = gan.gaussian_moments(latent)

        if generator_level == 0:
            g_code = self.global_encoder.apply(
                gan_params["global_encoder"], lr_rgb
            )
        else:
            g_code = self.global_encoder.apply(
                gan_params["global_encoder"], gt_rgb[None]
            )
        if generator_level == 2:
            l_lat = self.local_encoder.apply(
                gan_params["local_encoder"], gt_rgb[None]
            )
            z_map = gan.gaussian_sample(l_lat, k_z)
            latent = l_lat
        gan_rgb = self.generator.apply(
            gan_params["generator"],
            jnp.concatenate([lr_rgb, z_map], axis=-1), g_code,
        )
        gan_rgb = jax.image.resize(gan_rgb, (1, H, W, 3), method="linear")
        comp_rgb = jax.image.resize(lr_rgb, (1, H, W, 3), method="linear")

        out["comp_gan_rgb"] = jnp.clip(gan_rgb[0], 0.0, 1.0).reshape(-1, 3)
        out["comp_rgb"] = comp_rgb[0].reshape(-1, 3)
        out["kl"] = gan.gaussian_kl(latent)
        out["generator_level"] = generator_level

        # multi-level guidance: a stride-8 NeRF probe at a traced offset
        # compared against gt at the same pixels (:84-95)
        if is_train and gt_rgb is not None and int_offsets is not None:
            iy, ix = int_offsets
            take = lambda a: jax.lax.dynamic_slice(
                a, (iy, ix, 0), (H - 7, W - 7, 3)
            )[::8, ::8].reshape(-1, 3)
            out_int = self.base.render_rays(
                geo_params, bg_params, state,
                take(go), take(gd), take(gl),
                k_int, step=step, is_train=True,
            )
            out["comp_int_rgb"] = out_int["comp_rgb"][..., :3]
            out["comp_gt_rgb"] = take(gt_rgb)
        return out

    def render_image(self, geo_params, bg_params, state, rays_o, rays_d,
                     light_position, rng, step=0, gan_params=None, **kw):
        H, W = rays_o.shape[:2]
        n = H * W
        out = self.render_rays(
            geo_params, bg_params, state, rays_o.reshape(-1, 3),
            rays_d.reshape(-1, 3),
            jnp.broadcast_to(light_position[None], (n, 3)),
            rng, step=step, is_train=False, gan_params=gan_params,
            height=H, width=W,
        )
        res = {}
        for key in ("comp_rgb", "comp_gan_rgb"):
            if key in out:
                res[key] = out[key].reshape(H, W, 3)
        if "opacity" in out:
            hl = out["opacity"].shape[0]
            side = int(round(hl ** 0.5))
            res["opacity"] = jax.image.resize(
                out["opacity"].reshape(side, side, 1), (H, W, 1),
                method="linear",
            )
        return res
