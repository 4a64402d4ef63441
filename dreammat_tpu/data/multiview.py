"""Multiview posed-image datamodule (nerfstudio transforms.json layout).

TPU-native rebuild of ``multiview-camera-datamodule``
(/root/reference/threestudio_dreammat/threestudio/data/multiview.py:
61-427): a captured scene as frames with per-frame OPENCV intrinsics +
extrinsics, downsampled on load; training batches are one posed frame
(rays + its ground-truth image); eval replays the frames or slerps
between two of them (``eval_interpolation``).

The reference's torch Dataset/DataLoader machinery is replaced by
host-side numpy selection over preloaded fixed-shape arrays — one frame
per step, picked with the module RNG, zero per-step device work beyond
the final pytree.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.utils.base import BaseObject


def convert_pose(c2w: np.ndarray) -> np.ndarray:
    """OPENCV -> OpenGL camera convention (multiview.py:24-29)."""
    flip = np.eye(4, dtype=np.float32)
    flip[1, 1] = -1.0
    flip[2, 2] = -1.0
    return c2w @ flip


def inter_pose(pose_0: np.ndarray, pose_1: np.ndarray, ratio: float) -> np.ndarray:
    """Slerp rotation + lerp translation between two c2w poses in
    world-to-camera space (multiview.py:41-57)."""
    from scipy.spatial.transform import Rotation as Rot
    from scipy.spatial.transform import Slerp

    p0 = np.linalg.inv(pose_0)
    p1 = np.linalg.inv(pose_1)
    rots = Rot.from_matrix(np.stack([p0[:3, :3], p1[:3, :3]]))
    rot = Slerp([0, 1], rots)(ratio)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot.as_matrix()
    pose[:3, 3] = ((1.0 - ratio) * p0 + ratio * p1)[:3, 3]
    return np.linalg.inv(pose).astype(np.float32)


def _ray_directions(H, W, fx, fy, cx, cy):
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32) + 0.5,
        np.arange(H, dtype=np.float32) + 0.5,
        indexing="xy",
    )
    return np.stack(
        [(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], axis=-1
    )


@dreammat_tpu.register("multiview-camera-datamodule")
class MultiviewDataModule(BaseObject):
    @dataclass
    class Config:
        dataroot: str = ""
        train_downsample_resolution: int = 4
        eval_downsample_resolution: int = 4
        train_data_interval: int = 1
        eval_data_interval: int = 1
        batch_size: int = 1
        eval_batch_size: int = 1
        camera_layout: str = "around"
        camera_distance: float = -1.0
        eval_interpolation: Optional[Tuple[int, int, int]] = None
        n_test_views: int = 0  # 0 = all loaded frames
        seed: int = 0

    cfg: Config

    def configure(self, renderer=None, material=None) -> None:
        self.renderer = renderer
        self.material = material
        self.rng = np.random.RandomState(self.cfg.seed)

    def setup(self) -> None:
        cfg = self.cfg
        path = os.path.join(cfg.dataroot, "transforms.json")
        with open(path) as f:
            cam = json.load(f)
        assert cam.get("camera_model", "OPENCV") == "OPENCV", \
            "only the OPENCV camera model is supported (reference parity)"
        frames = cam["frames"][:: max(cfg.train_data_interval, 1)]
        scale = cfg.train_downsample_resolution
        self.H = int(frames[0]["h"]) // scale
        self.W = int(frames[0]["w"]) // scale

        c2ws = np.stack(
            [np.asarray(f["transform_matrix"], np.float32) for f in frames]
        )
        # recentre (around) / push back along mean view dir (front)
        # (multiview.py:108-123)
        c2ws[:, :3, 3] -= c2ws[:, :3, 3].mean(axis=0, keepdims=True)
        if cfg.camera_layout == "front":
            assert cfg.camera_distance > 0
            z = np.zeros((len(frames), 3, 1), np.float32)
            z[:, 2, :] = -1.0
            rot_z = (c2ws[:, :3, :3] @ z).mean(axis=0)[None]
            c2ws[:, :3, 3] -= rot_z[:, :, 0] * cfg.camera_distance
        elif cfg.camera_layout != "around":
            raise ValueError(f"unknown camera layout {cfg.camera_layout}")

        from PIL import Image

        rays_o, rays_d, imgs, positions = [], [], [], []
        self.c2ws = []
        for idx, frame in enumerate(frames):
            fx, fy = frame["fl_x"] / scale, frame["fl_y"] / scale
            cx, cy = frame["cx"] / scale, frame["cy"] / scale
            img = Image.open(
                os.path.join(cfg.dataroot, frame["file_path"])
            ).convert("RGB").resize((self.W, self.H))
            imgs.append(np.asarray(img, np.float32) / 255.0)
            c2w = convert_pose(c2ws[idx])
            self.c2ws.append(c2w)
            dirs = _ray_directions(self.H, self.W, fx, fy, cx, cy)
            rd = dirs @ c2w[:3, :3].T
            rd = rd / (np.linalg.norm(rd, axis=-1, keepdims=True) + 1e-8)
            ro = np.broadcast_to(c2w[:3, 3], rd.shape)
            rays_o.append(ro.reshape(-1, 3))
            rays_d.append(rd.reshape(-1, 3))
            positions.append(c2w[:3, 3])
        self.rays_o = np.stack(rays_o)     # [F, N, 3]
        self.rays_d = np.stack(rays_d)
        self.imgs = np.stack(imgs)         # [F, H, W, 3]
        self.positions = np.stack(positions)
        self.n_frames = len(frames)
        if not self.cfg.n_test_views:
            self.cfg.n_test_views = self.n_frames

    # -- batches -------------------------------------------------------------
    def frame_batch(self, i: int) -> Dict[str, Any]:
        n = self.H * self.W
        return {
            "index": i,
            "rays_o": jnp.asarray(self.rays_o[i]),
            "rays_d": jnp.asarray(self.rays_d[i]),
            "light_positions": jnp.broadcast_to(
                jnp.asarray(self.positions[i])[None], (n, 3)
            ),
            "gt_rgb": jnp.asarray(self.imgs[i]),
            "height": self.H,
            "width": self.W,
            "elevation": jnp.zeros((1,), jnp.float32),
            "azimuth": jnp.zeros((1,), jnp.float32),
            "camera_distances": jnp.asarray(
                [np.linalg.norm(self.positions[i])], jnp.float32
            ),
        }

    def collate(self, step: int = 0) -> Dict[str, Any]:
        return self.frame_batch(int(self.rng.randint(self.n_frames)))

    # -- eval ----------------------------------------------------------------
    def eval_rays(self, i: int) -> Dict[str, Any]:
        cfg = self.cfg
        if cfg.eval_interpolation is not None:
            a, b, n = cfg.eval_interpolation
            ratio = (i % n) / max(n - 1, 1)
            c2w = inter_pose(self.c2ws[a], self.c2ws[b], ratio)
            dirs = _ray_directions(
                self.H, self.W,
                # reuse frame a's intrinsics for the interpolated path
                *self._frame_intrinsics(a),
            )
            rd = dirs @ c2w[:3, :3].T
            rd = rd / (np.linalg.norm(rd, axis=-1, keepdims=True) + 1e-8)
            ro = np.broadcast_to(c2w[:3, 3], rd.shape)
            pos = c2w[:3, 3]
        else:
            f = i % self.n_frames
            ro = self.rays_o[f].reshape(self.H, self.W, 3)
            rd = self.rays_d[f].reshape(self.H, self.W, 3)
            pos = self.positions[f]
        return {
            "rays_o": jnp.asarray(ro).reshape(self.H, self.W, 3),
            "rays_d": jnp.asarray(rd).reshape(self.H, self.W, 3),
            "light_position": jnp.asarray(pos, jnp.float32),
            "elevation": jnp.zeros((1,), jnp.float32),
            "azimuth": jnp.zeros((1,), jnp.float32),
        }

    def _frame_intrinsics(self, idx):
        # recompute from the stored rays would be overkill; keep the common
        # case (shared intrinsics) by deriving from frame 0's ray grid
        rd = self.rays_d[idx].reshape(self.H, self.W, 3)
        # focal from the half-width ray angle
        c2w = self.c2ws[idx]
        local = rd @ c2w[:3, :3]
        fx = (self.W / 2) / abs(local[self.H // 2, -1, 0] / local[self.H // 2, -1, 2])
        fy = (self.H / 2) / abs(local[-1, self.W // 2, 1] / local[-1, self.W // 2, 2])
        return fx, fy, self.W / 2, self.H / 2
