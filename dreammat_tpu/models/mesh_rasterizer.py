"""Differentiable mesh renderer for explicit (DMTet) geometry.

TPU-native counterpart of ``nvdiff-rasterizer``
(/root/reference/threestudio_dreammat/threestudio/models/renderers/
nvdiff_rasterizer.py — nvdiffrast rasterize + interpolate + antialias).
nvdiffrast's CUDA pipeline decomposes as (a) a NON-differentiable
primitive-id pass, (b) differentiable attribute interpolation, and (c) a
differentiable edge antialias supplying silhouette gradients. The same
decomposition maps cleanly to TPU:

(a) **hit pass**: camera rays (pinhole rays ARE the rasterization
    correspondence) against the fixed-budget marching-tets soup —
    Möller-Trumbore over face chunks via ``lax.map``, hit ids
    stop-gradiented (piecewise constant, like nvdiffrast's id buffer);
(b) **interpolate**: the hit triangle's vertices are re-gathered
    differentiably and barycentrics/depth/position/normal recomputed in
    closed form — gradients flow into vertex positions and through them
    into the SDF/deformation (DMTet chain);
(c) **silhouette**: instead of screen-space edge antialias, opacity is a
    differentiable function of the underlying SDF grid itself — K
    trilinear samples along each ray, ``sigmoid(sharpness * max sdf)``.
    This moves silhouettes through the SDF directly (denser gradient
    signal than nvdiffrast's 1-px edge band, and exactly what the DMTet
    parameterization wants).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

import dreammat_tpu
from dreammat_tpu.models.geometry_volume import trilinear_sample
from dreammat_tpu.models.volume_renderer import ray_aabb
from dreammat_tpu.ops import dmtet
from dreammat_tpu.utils.base import BaseObject
from dreammat_tpu.utils.ops import safe_normalize

BIG = jnp.float32(1e10)


def _moller_trumbore(ro, rd, v0, v1, v2, eps=1e-9):
    """Batched ray-triangle: returns (t, u, v, hit). All [...]-shaped."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(rd, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    s = ro - v0
    u = jnp.sum(s * p, axis=-1) * inv
    q = jnp.cross(s, e1)
    v = jnp.sum(rd * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    hit = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (jnp.abs(det) > eps)
    return t, u, v, hit


@dreammat_tpu.register("nvdiff-rasterizer")
class MeshRasterizer(BaseObject):
    @dataclass
    class Config:
        radius: float = 1.0
        # silhouette-opacity model (replaces nvdiffrast antialias)
        sdf_opacity_sharpness: float = 50.0
        sdf_opacity_samples: int = 48
        face_chunk: int = 4096
        # reference config parity (no-op on TPU):
        context_type: str = "gl"
        # fields the volume-system hooks poke; the rasterizer has no
        # occupancy machinery
        estimator: str = "none"
        grid_prune: bool = False
        grid_update_every: int = 0
        eval_chunk_rays: int = 8192

    cfg: Config
    is_volume: bool = True  # consumes rays-only batches

    def __init__(self, cfg, geometry, material, background) -> None:
        self.geometry = geometry
        self.material = material
        self.background = background
        super().__init__(cfg)

    def configure(self) -> None:
        r = self.cfg.radius
        self.bbox_lo = jnp.asarray([-r] * 3, jnp.float32)
        self.bbox_hi = jnp.asarray([r] * 3, jnp.float32)
        self.mesh = None

    def init_state(self, rng):
        return {}

    def update_occ(self, geo_params, state, rng):
        return state

    # -- hard hit pass (stop-grad ids) ----------------------------------------
    def _cast(self, rays_o, rays_d, tri, valid):
        """Nearest hit over the face soup. On TPU this routes through the
        Pallas tiled dense caster (ops/bvh.py — VMEM running-min, tile-AABB
        cull, Morton ray reorder; the same kernel that casts the DreamMat
        G-buffers) by wrapping the soup as a single-node FlatBVH; invalid
        slots are all-zero triangles, which the caster's degenerate-plane
        check masks to id -1. Elsewhere (CPU tests): chunked Möller-
        Trumbore scan. Returns (hit_id [N], hit [N])."""
        from dreammat_tpu.utils.hw import is_tpu_backend

        if is_tpu_backend():
            from dreammat_tpu.ops import bvh as bvh_lib

            F = tri.shape[0]
            v0 = tri[:, 0]
            e1 = tri[:, 1] - v0
            e2 = tri[:, 2] - v0
            tid = jnp.where(valid, jnp.arange(F, dtype=jnp.int32), -1)
            r = self.cfg.radius
            soup = bvh_lib.FlatBVH(
                jnp.asarray([[-r, -r, -r]], jnp.float32),
                jnp.asarray([[r, r, r]], jnp.float32),
                jnp.asarray([-1], jnp.int32),
                jnp.zeros((1,), jnp.int32),
                jnp.asarray([F], jnp.int32),
                v0, e1, e2, tid,
                jnp.zeros((1, 9), jnp.float32),
                jnp.concatenate(
                    [v0, e1, e2, tid[:, None].astype(jnp.float32)], axis=1
                ),
            )
            out = bvh_lib.cast_rays_dense_pallas(soup, rays_o, rays_d)
            hit = out["face"] >= 0
            return jax.lax.stop_gradient(jnp.clip(out["face"], 0, F - 1)), hit
        F = tri.shape[0]
        C = min(self.cfg.face_chunk, F)
        pad = (-F) % C
        tri_p = jnp.pad(tri, ((0, pad), (0, 0), (0, 0)))
        val_p = jnp.pad(valid, (0, pad))
        n_chunks = tri_p.shape[0] // C

        def body(carry, ci):
            best_t, best_id = carry
            sl = jax.lax.dynamic_slice(
                tri_p, (ci * C, 0, 0), (C, 3, 3)
            )
            vl = jax.lax.dynamic_slice(val_p, (ci * C,), (C,))
            t, u, v, hit = _moller_trumbore(
                rays_o[:, None, :], rays_d[:, None, :],
                sl[None, :, 0], sl[None, :, 1], sl[None, :, 2],
            )
            t = jnp.where(hit & vl[None, :], t, BIG)
            j = jnp.argmin(t, axis=1)
            tm = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
            better = tm < best_t
            best_id = jnp.where(better, ci * C + j, best_id)
            best_t = jnp.minimum(best_t, tm)
            return (best_t, best_id), None

        N = rays_o.shape[0]
        (best_t, best_id), _ = jax.lax.scan(
            body, (jnp.full((N,), BIG), jnp.zeros((N,), jnp.int32)),
            jnp.arange(n_chunks),
        )
        return jax.lax.stop_gradient(best_id), best_t < BIG

    # -- differentiable opacity from the SDF grid -----------------------------
    def _sdf_opacity(self, geo_params, rays_o, rays_d):
        cfg = self.cfg
        res = self.geometry.cfg.isosurface_resolution + 1
        grid = geo_params["sdf"].reshape(res, res, res, 1)
        if getattr(self.geometry.cfg, "fix_geometry", False):
            grid = jax.lax.stop_gradient(grid)
        t0, t1 = ray_aabb(rays_o, rays_d, self.bbox_lo, self.bbox_hi)
        K = cfg.sdf_opacity_samples
        frac = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
        t = t0[:, None] + frac[None, :] * (t1 - t0)[:, None]
        pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
        x01 = (pts - self.bbox_lo) / (self.bbox_hi - self.bbox_lo)
        s = trilinear_sample(grid, jnp.clip(x01, 0.0, 1.0))[..., 0]
        s = jnp.where((t1 > t0)[:, None], s, -1.0)
        smax = jnp.max(s, axis=1)
        return jax.nn.sigmoid(cfg.sdf_opacity_sharpness * smax)[:, None]

    # -- main -----------------------------------------------------------------
    def render_rays(
        self, geo_params, bg_params, state, rays_o, rays_d, light_positions,
        rng, step=0, is_train: bool = False, render_rgb: bool = True,
    ) -> Dict[str, Any]:
        mesh = self.geometry.isosurface(geo_params)
        hit_id, hit = self._cast(
            rays_o, rays_d, jax.lax.stop_gradient(mesh.tri_verts), mesh.valid
        )
        # differentiable re-interpolation at the hit triangle
        v = mesh.tri_verts[hit_id]                       # [N,3,3]
        t, u, w, _ = _moller_trumbore(rays_o, rays_d, v[:, 0], v[:, 1], v[:, 2])
        bary = jnp.stack([1.0 - u - w, u, w], axis=-1)   # [N,3]
        pos = rays_o + rays_d * t[:, None]
        vn_all = dmtet.vertex_normals_by_gid(
            mesh.tri_verts, mesh.valid, mesh.edge_gid
        )
        vn = vn_all[hit_id]                              # [N,3,3]
        normal = safe_normalize(jnp.sum(bary[..., None] * vn, axis=1))

        opacity = self._sdf_opacity(geo_params, rays_o, rays_d)
        m = hit[:, None].astype(jnp.float32)
        # composite opacity: hard hits are opaque; the SDF sigmoid supplies
        # the differentiable silhouette band
        op = jnp.clip(opacity * 0.5 + m * 0.5, 0.0, 1.0)

        comp_rgb_bg = self.background(rays_d, bg_params)
        comp_normal = (normal + 1.0) / 2.0 * m

        out: Dict[str, Any] = {
            "opacity": op,
            "depth": jnp.where(hit[:, None], t[:, None], 0.0),
            "comp_normal": comp_normal,
            "normal": normal[:, None, :],   # [N,1,3] sample-dim compat
            "comp_rgb_bg": comp_rgb_bg,
            "mesh": mesh,
            "hit": hit,
            "positions": pos,
        }
        if render_rgb and getattr(self.geometry, "feature_dims", None) is not None:
            feats = self.geometry.export_features(geo_params, pos)
            rgb_fg = self.material(
                feats,
                positions=pos,
                shading_normal=normal,
                light_positions=light_positions,
                viewdirs=rays_d,
                rng=rng,
                step=step,
                is_train=is_train,
            )
            out["comp_rgb_fg"] = rgb_fg * m
            out["comp_rgb"] = rgb_fg * op + comp_rgb_bg * (1.0 - op)
        else:
            # geometry stage: normal image composited over white like the
            # reference's render_rgb=False path
            out["comp_rgb"] = comp_normal * op + comp_rgb_bg * (1.0 - op)
        return out

    # -- eval helper (chunked, mirrors volume renderers) ----------------------
    def render_image(
        self, geo_params, bg_params, state, rays_o, rays_d, light_position,
        rng, step=0, **kw,
    ) -> Dict[str, Any]:
        H, W = rays_o.shape[:2]
        n = H * W
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        lp = jnp.broadcast_to(light_position[None], (n, 3))
        C = min(self.cfg.eval_chunk_rays, n)
        pad = (-n) % C
        ro = jnp.pad(ro, ((0, pad), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0)))
        lp = jnp.pad(lp, ((0, pad), (0, 0)))
        outs = []
        for i in range(0, n + pad, C):
            outs.append(self.render_rays(
                geo_params, bg_params, state, ro[i:i + C], rd[i:i + C],
                lp[i:i + C], jax.random.fold_in(rng, i), step=step,
                is_train=False, **kw,
            ))
        keys = ("comp_rgb", "opacity", "depth", "comp_normal")
        out = {}
        for key in keys:
            if key in outs[0]:
                v = jnp.concatenate([o[key] for o in outs])[:n]
                out[key] = v.reshape(H, W, v.shape[-1])
        return out
