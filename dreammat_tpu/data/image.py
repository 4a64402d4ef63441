"""Single-image datamodule: one fixed reference view + random novel views.

TPU-native rebuild of ``single-image-datamodule``
(/root/reference/threestudio_dreammat/threestudio/data/image.py:32-338):
a reference RGBA image (optionally with depth/normal side files) observed
from a fixed default camera, plus an embedded random-camera generator for
the guidance views (``use_random_camera``, :57-69). Batches carry BOTH the
reference-view supervision tensors and a nested ``random_camera`` rays
batch — the zero123/magic123 systems consume the two in one jitted step.

Host-side numpy sampling picks cameras; everything handed to the step is a
fixed-shape pytree (same stance as ``datamodule.py``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.utils import ops as uops
from dreammat_tpu.utils.base import BaseObject


def _load_rgba(path: str, width: int, height: int):
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    img = img.resize((width, height), Image.LANCZOS)
    rgba = np.asarray(img, dtype=np.float32) / 255.0
    return rgba[..., :3], (rgba[..., 3:] > 0.5).astype(np.float32)


def _load_gray(path: str, width: int, height: int, channels: int):
    from PIL import Image

    img = Image.open(path)
    img = img.resize((width, height), Image.LANCZOS)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr[..., :channels]


@dreammat_tpu.register("single-image-datamodule")
class SingleImageDataModule(BaseObject):
    @dataclass
    class Config:
        height: int = 96
        width: int = 96
        default_elevation_deg: float = 0.0
        default_azimuth_deg: float = -180.0
        default_camera_distance: float = 1.2
        default_fovy_deg: float = 60.0
        image_path: str = ""
        use_random_camera: bool = True
        random_camera: dict = field(default_factory=dict)
        rays_noise_scale: float = 2e-3
        batch_size: int = 1
        requires_depth: bool = False
        requires_normal: bool = False
        # reference parity: resolution_milestones schedule multiple sizes;
        # fixed-shape jit wants ONE size — accepted and ignored beyond [0]
        resolution_milestones: Any = None
        n_test_views: int = 120
        eval_height: Optional[int] = None  # defaults to height/width
        eval_width: Optional[int] = None
        seed: int = 0

    cfg: Config

    def configure(self, renderer=None, material=None) -> None:
        cfg = self.cfg
        self.renderer = renderer
        self.material = material
        # embedded random-camera module for guidance views (:57-69)
        rc = dict(cfg.random_camera)
        rc.setdefault("height", cfg.height)
        rc.setdefault("width", cfg.width)
        rc.setdefault("eval_height", cfg.eval_height or cfg.height)
        rc.setdefault("eval_width", cfg.eval_width or cfg.width)
        rc.setdefault("n_test_views", cfg.n_test_views)
        rc.setdefault("use_fix_views", False)
        self.inner = dreammat_tpu.find("random-camera-datamodule")(
            rc, renderer, material
        )

        # fixed reference camera (:71-134)
        elev = np.deg2rad(cfg.default_elevation_deg)
        azim = np.deg2rad(cfg.default_azimuth_deg)
        d = cfg.default_camera_distance
        pos = np.asarray(
            [d * np.cos(elev) * np.cos(azim),
             d * np.cos(elev) * np.sin(azim),
             d * np.sin(elev)], np.float32,
        )
        c2w = uops.get_c2w(
            jnp.asarray(pos)[None], jnp.zeros((1, 3)),
            jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        )[0]
        focal = 0.5 * cfg.height / np.tan(0.5 * np.deg2rad(cfg.default_fovy_deg))
        dirs = uops.get_ray_directions(cfg.height, cfg.width, focal=float(focal))
        rays_o, rays_d = uops.get_rays(dirs, c2w, keepdim=True)
        if cfg.rays_noise_scale > 0:
            # the reference jitters reference-view ray dirs (:144-146)
            noise = (
                jax.random.normal(
                    jax.random.PRNGKey(cfg.seed), rays_d.shape
                ) * cfg.rays_noise_scale
            )
            rays_d = rays_d + noise
            rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        self.ref_rays_o = rays_o.reshape(-1, 3)
        self.ref_rays_d = rays_d.reshape(-1, 3)
        self.ref_position = pos
        self.c2w = c2w

    def setup(self) -> None:
        cfg = self.cfg
        if not cfg.image_path or not os.path.exists(cfg.image_path):
            raise FileNotFoundError(f"image_path {cfg.image_path!r} not found")
        rgb, mask = _load_rgba(cfg.image_path, cfg.width, cfg.height)
        self.rgb = jnp.asarray(rgb)
        self.mask = jnp.asarray(mask)
        self.depth = None
        self.normal = None
        if cfg.requires_depth:
            p = cfg.image_path.replace("_rgba.png", "_depth.png")
            self.depth = jnp.asarray(_load_gray(p, cfg.width, cfg.height, 1))
        if cfg.requires_normal:
            p = cfg.image_path.replace("_rgba.png", "_normal.png")
            self.normal = jnp.asarray(_load_gray(p, cfg.width, cfg.height, 3))
        self.inner.setup()

    # -- batches -------------------------------------------------------------
    def ref_batch(self) -> Dict[str, Any]:
        cfg = self.cfg
        n = cfg.height * cfg.width
        b = {
            "rays_o": self.ref_rays_o,
            "rays_d": self.ref_rays_d,
            "light_positions": jnp.broadcast_to(
                jnp.asarray(self.ref_position)[None], (n, 3)
            ),
            "height": cfg.height,
            "width": cfg.width,
            "elevation": jnp.asarray([cfg.default_elevation_deg], jnp.float32),
            "azimuth": jnp.asarray([cfg.default_azimuth_deg], jnp.float32),
            "camera_distances": jnp.asarray(
                [cfg.default_camera_distance], jnp.float32
            ),
            "rgb": self.rgb,
            "mask": self.mask,
        }
        if self.depth is not None:
            b["ref_depth"] = self.depth
        if self.normal is not None:
            b["ref_normal"] = self.normal
        return b

    def collate(self, step: int = 0) -> Dict[str, Any]:
        batch = self.ref_batch()
        if self.cfg.use_random_camera:
            batch["random_camera"] = self.inner._collate_rays(step)
        return batch

    # -- eval (novel-view circle from the embedded module) -------------------
    def eval_rays(self, i: int) -> Dict[str, Any]:
        return self.inner.eval_rays(i)
