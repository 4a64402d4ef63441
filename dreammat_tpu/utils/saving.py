"""Artifact savers: images, grids, gifs, OBJ/MTL meshes.

Rebuild of the reference ``SaverMixin``
(/root/reference/threestudio_dreammat/threestudio/utils/saving.py:22-667):
RGB/grayscale image saving, multi-panel grids, per-channel PNGs with alpha,
120-frame gifs, and the OBJ+MTL+texture-map writer used at export
(save_obj 456-514, _save_mtl 561+). Uses PIL/imageio (host-side)."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np


def _to_uint8(img: np.ndarray, data_range=(0, 1)) -> np.ndarray:
    lo, hi = data_range
    x = (np.asarray(img, dtype=np.float32) - lo) / (hi - lo + 1e-12)
    x = np.nan_to_num(x)
    return (np.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_image(path: str, img: np.ndarray, data_range=(0, 1)) -> str:
    """img: [H,W,3|1] float or uint8."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = _to_uint8(arr, data_range)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
    return path


def save_image_with_alpha(path: str, img: np.ndarray, alpha: np.ndarray, data_range=(0, 1)) -> str:
    """RGBA png (reference per-channel PBR saves, dreammat.py:289-296)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rgb = _to_uint8(img, data_range)
    if rgb.ndim == 2 or rgb.shape[-1] == 1:
        rgb = np.repeat(rgb.reshape(*rgb.shape[:2], 1), 3, axis=-1)
    a = _to_uint8(alpha.reshape(*alpha.shape[:2], 1))
    Image.fromarray(np.concatenate([rgb, a], axis=-1)).save(path)
    return path


def make_grid(rows: List[List[Dict[str, Any]]], border: int = 2) -> np.ndarray:
    """rows of {"img": [H,W,C], "data_range": (lo,hi)} panels -> one image.
    (reference get_image_grid_, saving.py:188-260)."""
    panels_by_row = []
    for row in rows:
        panels = []
        for spec in row:
            img = np.asarray(spec["img"])
            rng = spec.get("data_range", (0, 1))
            arr = _to_uint8(img, rng)
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 3, axis=-1)
            elif arr.shape[-1] == 1:
                arr = np.repeat(arr, 3, axis=-1)
            panels.append(arr)
        h = max(p.shape[0] for p in panels)
        padded = [
            np.pad(p, ((0, h - p.shape[0]), (border, border), (0, 0)), constant_values=255)
            for p in panels
        ]
        panels_by_row.append(np.concatenate(padded, axis=1))
    w = max(r.shape[1] for r in panels_by_row)
    padded_rows = [
        np.pad(r, ((border, border), (0, w - r.shape[1]), (0, 0)), constant_values=255)
        for r in panels_by_row
    ]
    return np.concatenate(padded_rows, axis=0)


def save_image_grid(path: str, rows: List[List[Dict[str, Any]]]) -> str:
    return save_image(path, make_grid(rows), data_range=(0, 255))


def save_gif(path: str, frames: List[np.ndarray], fps: int = 30, data_range=(0, 1)) -> str:
    """(reference save_gif, saving.py:401-408)."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrs = [_to_uint8(f, data_range) for f in frames]
    imageio.mimsave(path, arrs, duration=1000.0 / fps, loop=0)
    return path


def save_obj_with_mtl(
    out_dir: str,
    name: str,
    v_pos: np.ndarray,
    t_pos_idx: np.ndarray,
    v_tex: Optional[np.ndarray] = None,
    t_tex_idx: Optional[np.ndarray] = None,
    v_nrm: Optional[np.ndarray] = None,
    albedo_map: Optional[np.ndarray] = None,
    metallic_map: Optional[np.ndarray] = None,
    roughness_map: Optional[np.ndarray] = None,
    bump_map: Optional[np.ndarray] = None,
) -> str:
    """OBJ + MTL with map_Kd / map_Pm / map_Pr (/ map_Bump) — the exact keys
    the reference writes (saving.py:561-614, mesh_exporter.py:107-137)."""
    os.makedirs(out_dir, exist_ok=True)
    obj_path = os.path.join(out_dir, f"{name}.obj")
    mtl_name = f"{name}.mtl"

    with open(obj_path, "w") as f:
        f.write(f"mtllib {mtl_name}\n")
        for v in np.asarray(v_pos):
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if v_tex is not None:
            for vt in np.asarray(v_tex):
                f.write(f"vt {vt[0]:.6f} {1.0 - vt[1]:.6f}\n")
        if v_nrm is not None:
            for vn in np.asarray(v_nrm):
                f.write(f"vn {vn[0]:.6f} {vn[1]:.6f} {vn[2]:.6f}\n")
        f.write(f"usemtl {name}\n")
        F = np.asarray(t_pos_idx)
        FT = np.asarray(t_tex_idx) if t_tex_idx is not None else F
        for i in range(F.shape[0]):
            toks = []
            for k in range(3):
                vi = F[i, k] + 1
                ti = FT[i, k] + 1 if v_tex is not None else ""
                ni = vi if v_nrm is not None else ""
                toks.append(f"{vi}/{ti}/{ni}" if v_tex is not None or v_nrm is not None else f"{vi}")
            f.write("f " + " ".join(toks) + "\n")

    with open(os.path.join(out_dir, mtl_name), "w") as f:
        f.write(f"newmtl {name}\n")
        f.write("Ka 1.000 1.000 1.000\nKd 1.000 1.000 1.000\nKs 0.000 0.000 0.000\n")
        if albedo_map is not None:
            save_image(os.path.join(out_dir, "texture_kd.jpg"), albedo_map)
            f.write("map_Kd texture_kd.jpg\n")
        if metallic_map is not None:
            save_image(os.path.join(out_dir, "texture_metallic.jpg"), metallic_map)
            f.write("map_Pm texture_metallic.jpg\n")
        if roughness_map is not None:
            save_image(os.path.join(out_dir, "texture_roughness.jpg"), roughness_map)
            f.write("map_Pr texture_roughness.jpg\n")
        if bump_map is not None:
            save_image(os.path.join(out_dir, "texture_nrm.jpg"), bump_map)
            f.write("map_Bump texture_nrm.jpg\n")
    return obj_path
