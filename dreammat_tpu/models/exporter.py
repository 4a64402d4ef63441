"""Mesh exporter: UV unwrap -> texel bake -> OBJ+MTL+texture maps.

Rebuild of ``MeshExporter``
(/root/reference/threestudio_dreammat/threestudio/models/exporters/
mesh_exporter.py:17-175): rasterize the UV chart at texture resolution,
sample the material field at texel surface positions, inpaint the padding,
and write OBJ/MTL with map_Kd / map_Pm / map_Pr.

Differences, by design:
- xatlas (C++ dep) is replaced by a self-contained dominant-axis smart
  unwrap (charts = connected components bucketed by face-normal axis+sign,
  shelf-packed). Meshes that already carry UVs use them directly.
- UV rasterization reuses the BVH ray caster (UV triangles embedded at
  z=0, one orthographic ray per texel) — one geometric kernel everywhere.
- TELEA inpainting is replaced by iterative nearest-valid dilation in JAX.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.models.mesh import Mesh
from dreammat_tpu.ops import bvh as bvh_lib
from dreammat_tpu.utils import saving
from dreammat_tpu.utils.base import BaseObject


# ---------------------------------------------------------------------------
# smart UV unwrap (host-side, once per export)
# ---------------------------------------------------------------------------

def smart_unwrap(v_pos: np.ndarray, faces: np.ndarray, padding: float = 0.01):
    """Returns (v_tex [F*3,2], t_tex_idx [F,3]): per-chart orthographic
    projection, charts = connected faces sharing a dominant normal axis+sign,
    shelf-packed into [0,1]^2 by area."""
    F = faces.shape[0]
    v0, v1, v2 = v_pos[faces[:, 0]], v_pos[faces[:, 1]], v_pos[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    fn = fn / (np.linalg.norm(fn, axis=-1, keepdims=True) + 1e-12)
    axis = np.argmax(np.abs(fn), axis=-1)  # 0,1,2
    sign = np.sign(fn[np.arange(F), axis])
    bucket = axis * 2 + (sign > 0).astype(np.int64)  # 0..5

    # connected components within buckets (via shared edges)
    # union-find over faces
    parent = np.arange(F)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edge_map: Dict[Tuple[int, int], int] = {}
    for f in range(F):
        for k in range(3):
            a, b = faces[f, k], faces[f, (k + 1) % 3]
            key = (min(a, b), max(a, b))
            if key in edge_map:
                g = edge_map[key]
                if bucket[g] == bucket[f]:
                    ra, rb = find(f), find(g)
                    if ra != rb:
                        parent[ra] = rb
            else:
                edge_map[key] = f
    comp = np.array([find(f) for f in range(F)])

    # per-chart 2D coords (project along dominant axis)
    proj_axes = {0: (1, 2), 1: (0, 2), 2: (0, 1)}
    charts = {}
    for f in range(F):
        charts.setdefault(comp[f], []).append(f)

    uv = np.zeros((F, 3, 2), dtype=np.float64)
    rects = []  # (chart_id, w, h)
    for cid, fl in charts.items():
        fl = np.asarray(fl)
        a = int(axis[fl[0]])
        u_ax, v_ax = proj_axes[a]
        tri = v_pos[faces[fl]]  # [n,3,3]
        pu = tri[..., u_ax]
        pv = tri[..., v_ax]
        if sign[fl[0]] < 0:  # mirror to keep orientation
            pu = -pu
        lo_u, lo_v = pu.min(), pv.min()
        uv[fl, :, 0] = pu - lo_u
        uv[fl, :, 1] = pv - lo_v
        rects.append((cid, float(uv[fl, :, 0].max()), float(uv[fl, :, 1].max())))

    # shelf packing by decreasing height
    rects.sort(key=lambda r: -r[2])
    total_area = sum((w + 1e-6) * (h + 1e-6) for _, w, h in rects)
    target_w = float(np.sqrt(total_area) * 1.15) + 1e-6
    x = y = shelf_h = 0.0
    place = {}
    for cid, w, h in rects:
        if x + w > target_w and x > 0:
            y += shelf_h + padding * target_w
            x, shelf_h = 0.0, 0.0
        place[cid] = (x, y)
        x += w + padding * target_w
        shelf_h = max(shelf_h, h)
    total_h = y + shelf_h

    scale = 1.0 / max(target_w, total_h + 1e-6) * (1.0 - 2 * padding)
    for cid, fl in charts.items():
        fl = np.asarray(fl)
        ox, oy = place[cid]
        uv[fl, :, 0] = (uv[fl, :, 0] + ox) * scale + padding
        uv[fl, :, 1] = (uv[fl, :, 1] + oy) * scale + padding

    v_tex = uv.reshape(F * 3, 2).astype(np.float32)
    t_tex_idx = np.arange(F * 3, dtype=np.int32).reshape(F, 3)
    return v_tex, t_tex_idx


def rasterize_uv_texels(
    v_tex: np.ndarray, t_tex_idx: np.ndarray, resolution: int
):
    """For each texel center: covering UV triangle + barycentrics, via the
    BVH caster on z=0-embedded UV triangles. Returns (face [R], u, v, hit)."""
    V = np.zeros((len(v_tex), 3), dtype=np.float32)
    V[:, :2] = v_tex
    bvh = bvh_lib.build_bvh(V, t_tex_idx)
    t = (np.arange(resolution) + 0.5) / resolution
    uu, vv = np.meshgrid(t, t, indexing="xy")
    origins = np.stack([uu, vv, np.ones_like(uu)], axis=-1).reshape(-1, 3).astype(np.float32)
    dirs = np.tile(np.asarray([[0.0, 0.0, -1.0]], dtype=np.float32), (origins.shape[0], 1))
    out = bvh_lib.cast_rays_chunked(bvh, jnp.asarray(origins), jnp.asarray(dirs))
    return out


def inpaint_padding(img: jnp.ndarray, valid: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Dilate valid texels into the background (replaces cv2 TELEA inpaint,
    mesh_exporter.py:93-104). img [H,W,C], valid [H,W]."""
    v = valid.astype(jnp.float32)[..., None]
    x = img * v

    def body(_, carry):
        x, v = carry
        ker = jnp.ones((3, 3, 1, 1))
        xs = jax.lax.conv_general_dilated(
            jnp.moveaxis(x, -1, 0)[:, None], ker, (1, 1), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )[:, 0]
        xs = jnp.moveaxis(xs, 0, -1)
        vs = jax.lax.conv_general_dilated(
            v[None].transpose(0, 3, 1, 2), ker, (1, 1), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )[0].transpose(1, 2, 0)
        fill = xs / jnp.maximum(vs, 1e-6)
        newv = jnp.minimum(vs, 1.0)
        x2 = jnp.where(v > 0, x, fill * (newv > 0))
        return (x2, jnp.maximum(v, (newv > 0).astype(jnp.float32)))

    x, v = jax.lax.fori_loop(0, iters, body, (x, v))
    return x


@dreammat_tpu.register("mesh-exporter")
class MeshExporter(BaseObject):
    @dataclass
    class Config:
        fmt: str = "obj-mtl"
        save_name: str = "model"
        texture_size: int = 2048
        texture_format: str = "jpg"
        save_uv: bool = True

    cfg: Config

    def configure(self, geometry, material) -> None:
        self.geometry = geometry
        self.material = material

    def export_obj_with_mtl(self, geo_params, out_dir: str) -> str:
        """(mesh_exporter.py:53-137)."""
        mesh: Mesh = self.geometry.isosurface()
        v_pos = np.asarray(mesh.v_pos)
        faces = np.asarray(mesh.t_pos_idx)
        if mesh.v_tex is not None and mesh.t_tex_idx is not None:
            v_tex = np.asarray(mesh.v_tex)
            t_tex_idx = np.asarray(mesh.t_tex_idx)
        else:
            v_tex, t_tex_idx = smart_unwrap(v_pos, faces)

        res = self.cfg.texture_size
        rast = rasterize_uv_texels(v_tex, t_tex_idx, res)
        hit = np.asarray(rast["hit"])
        face = np.maximum(np.asarray(rast["face"]), 0)
        u = np.asarray(rast["u"])[:, None]
        v = np.asarray(rast["v"])[:, None]
        tris = faces[face]
        pos = (
            (1 - u - v) * v_pos[tris[:, 0]]
            + u * v_pos[tris[:, 1]]
            + v * v_pos[tris[:, 2]]
        )

        # chunk the field query: 2048^2 texels in one hashgrid call OOMs a
        # 16GB chip (per-level corner intermediates)
        from dreammat_tpu.utils.ops import chunk_batch

        feats = chunk_batch(
            lambda p: self.geometry.apply(geo_params, p), 1 << 18, jnp.asarray(pos)
        )
        maps = self.material.export(feats)
        valid = jnp.asarray(hit).reshape(res, res)
        albedo = inpaint_padding(maps["albedo"].reshape(res, res, 3), valid)
        metallic = inpaint_padding(maps["metallic"].reshape(res, res, 1), valid)
        roughness = inpaint_padding(maps["roughness"].reshape(res, res, 1), valid)
        bump = None
        if "bump" in maps:
            bump = np.asarray(inpaint_padding(maps["bump"].reshape(res, res, 3), valid))

        return saving.save_obj_with_mtl(
            out_dir, self.cfg.save_name,
            v_pos, faces, v_tex, t_tex_idx, np.asarray(mesh.v_nrm),
            albedo_map=np.asarray(albedo),
            metallic_map=np.asarray(metallic)[..., 0],
            roughness_map=np.asarray(roughness)[..., 0],
            bump_map=bump,
        )
