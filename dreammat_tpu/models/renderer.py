"""Ray-cast renderer: G-buffers + Monte-Carlo PBR shading.

TPU-native rebuild of ``RaytraceRender``
(/root/reference/threestudio_dreammat/threestudio/models/renderers/
raytracing_renderer.py:85-343). Architectural differences, by design:

- **no nvdiffrast**: the G-buffer (hit position / interpolated normal /
  depth / mask) comes from first-hit BVH ray casting — the same primitive
  used for visibility — so there is a single geometric kernel to optimize.
- **fixed shapes**: the reference boolean-masks foreground pixels
  (``selector`` fancy-indexing, raytracing_renderer.py:126-207) which is
  dynamic-shaped; here each fixed camera's foreground pixel list is
  precomputed ONCE on the host and padded to a static ``pixel_budget``, so
  the per-step jitted function is pure fixed-size gather/scatter.
- **G-buffers precomputed**: cameras are fixed and geometry is frozen on
  the DreamMat path, so per-view G-buffers are computed once per mesh
  instead of re-rasterizing every step.
- antialiasing: the reference relies on nvdiffrast's analytic antialias for
  edge smoothing only (materials are the only optimized quantity; coverage
  gradients are not needed — see SURVEY §7 hard-part 3). We composite with
  the binary mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.models.mesh import Mesh
from dreammat_tpu.ops import bvh as bvh_lib
from dreammat_tpu.utils import ops as uops
from dreammat_tpu.utils.base import BaseObject


class GBufferView(NamedTuple):
    """Per-fixed-camera precomputed buffers (all static shapes)."""

    mask: jnp.ndarray        # [H,W] bool
    cn_normal: jnp.ndarray   # [H,W,3] controlnet-style view-space normal
    cn_depth: jnp.ndarray    # [H,W,1] inverse-normalized depth
    fg_idx: jnp.ndarray      # [P] int32 flattened pixel indices (padded)
    fg_valid: jnp.ndarray    # [P] bool
    fg_pos: jnp.ndarray      # [P,3] world hit positions
    fg_normal: jnp.ndarray   # [P,3] shading normals (interpolated v_nrm)
    fg_viewdir: jnp.ndarray  # [P,3] direction surface -> camera
    fg_tri: jnp.ndarray      # [P,3] int32 vertex ids of the hit triangle
    fg_bary: jnp.ndarray     # [P,3] barycentric weights
    fg_uv: jnp.ndarray       # [P,2] interpolated texture coords (zeros if none)


@dreammat_tpu.register("raytracing-renderer")
class RaytraceRenderer(BaseObject):
    @dataclass
    class Config:
        context_type: str = "jax"  # accepted for config parity; unused
        change_type: str = "gaussian"
        change_eps: float = 0.05
        pixel_budget: int = 0  # 0 => auto (max fg count, padded)
        # "baked": per-vertex octahedral visibility baked once per mesh (fast
        # TPU default); "raytrace": exact per-step BVH rays (reference
        # parity); "none": no shadow rays
        visibility_mode: str = "baked"
        visibility_oct_res: int = 16

    cfg: Config

    def configure(self, geometry, material, background) -> None:
        self.geometry = geometry
        self.material = material
        self.background = background
        self.mesh: Mesh = geometry.isosurface()
        self.bvh = bvh_lib.build_bvh(
            np.asarray(self.mesh.v_pos), np.asarray(self.mesh.t_pos_idx)
        )
        if self.cfg.visibility_mode == "raytrace":
            self.material.set_raytracer(self.trace)
        elif self.cfg.visibility_mode == "baked":
            from dreammat_tpu.ops import visibility as vis_lib

            baked = vis_lib.bake_vertex_visibility(
                self.bvh, self.mesh.v_pos, self.mesh.v_nrm,
                oct_res=self.cfg.visibility_oct_res,
            )
            self.material.set_baked_visibility(baked)

    # ------------------------------------------------------------------
    def trace(self, rays_o, rays_d):
        """Reference-compatible trace (raytracing_renderer.py:318-324):
        returns (positions, face_normals, depth [N,1], hit_mask)."""
        if self.bvh.tri_packed.shape[0] <= bvh_lib.DENSE_CAST_MAX_TRIS:
            out = bvh_lib.cast_rays_dense(self.bvh, rays_o, rays_d)
        else:
            out = bvh_lib.cast_rays(self.bvh, rays_o, rays_d)
        t = out["t"]
        positions = rays_o + t[:, None] * rays_d
        fn = self.mesh.face_normals
        normals = fn[jnp.maximum(out["face"], 0)]
        return positions, normals, t[:, None], out["hit"]

    # ------------------------------------------------------------------
    def build_gbuffer(
        self,
        rays_o: jnp.ndarray,   # [H,W,3]
        rays_d: jnp.ndarray,   # [H,W,3]
        w2c: jnp.ndarray,      # [4,4]
        pixel_budget: Optional[int] = None,
    ) -> GBufferView:
        """Cast one camera's rays and assemble the per-view buffers.
        Host-called once per (mesh, camera); internally jitted pieces."""
        H, W = rays_o.shape[:2]
        out = bvh_lib.cast_rays_chunked(
            self.bvh, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
        )
        hit = out["face"] >= 0
        t = out["t"]
        face = jnp.maximum(out["face"], 0)
        u = out["u"][:, None]
        v = out["v"][:, None]
        tri = self.mesh.t_pos_idx[face]
        vn = self.mesh.v_nrm
        normal = uops.safe_normalize(
            (1 - u - v) * vn[tri[:, 0]] + u * vn[tri[:, 1]] + v * vn[tri[:, 2]]
        )
        pos = rays_o.reshape(-1, 3) + t[:, None] * rays_d.reshape(-1, 3)

        # controlnet-style view-space normal (raytracing_renderer.py:326-331)
        n_view = jnp.einsum("nk,ik->ni", normal, w2c[:3, :3], precision="highest")
        n_view = uops.safe_normalize(n_view)
        cn = 0.5 * (n_view + 1.0)
        cn = cn.at[:, 0].set(1.0 - cn[:, 0])  # bae convention x-flip
        cn_bg = jnp.asarray([0.5, 0.5, 1.0])
        cn_normal = jnp.where(hit[:, None], cn, cn_bg).reshape(H, W, 3)

        # inverse-normalized depth (raytracing_renderer.py:333-343)
        min_val = 0.3
        inv = 1.0 / (t + 1e-6)
        # masked min/max (no NaN sentinels, keeps jax_debug_nans usable)
        dmax = jnp.max(jnp.where(hit, inv, -jnp.inf))
        dmin = jnp.min(jnp.where(hit, inv, jnp.inf))
        dn = (1 - min_val) * (inv - dmin) / (dmax - dmin + 1e-6) + min_val
        cn_depth = jnp.where(hit, dn, 0.0).reshape(H, W, 1)

        # fixed-budget foreground gather (host-side nonzero, once per view)
        hit_np = np.asarray(hit)
        idx_np = np.nonzero(hit_np)[0]
        P = pixel_budget or self.cfg.pixel_budget
        if P <= 0:
            P = int(np.ceil(max(len(idx_np), 1) / 1024) * 1024)
        if len(idx_np) > P:
            dreammat_tpu.warn(
                "foreground pixels (%d) exceed pixel budget (%d); subsampling",
                len(idx_np), P,
            )
            sel = np.linspace(0, len(idx_np) - 1, P).astype(np.int64)
            idx_np = idx_np[sel]
        valid_np = np.zeros(P, dtype=bool)
        valid_np[: len(idx_np)] = True
        pad_idx = np.zeros(P, dtype=np.int64)
        pad_idx[: len(idx_np)] = idx_np
        fg_idx = jnp.asarray(pad_idx, dtype=jnp.int32)

        viewdir = -uops.safe_normalize(rays_d.reshape(-1, 3))
        bary = jnp.concatenate([1.0 - u - v, u, v], axis=-1)
        # interpolated UVs for the 2D-field input mode
        # (reference raytracing_renderer.py:177-181)
        if self.mesh.v_tex is not None and self.mesh.t_tex_idx is not None:
            tt = self.mesh.t_tex_idx[face]
            vt = self.mesh.v_tex
            uv_interp = (1 - u - v) * vt[tt[:, 0]] + u * vt[tt[:, 1]] + v * vt[tt[:, 2]]
        else:
            uv_interp = jnp.zeros((hit.shape[0], 2))
        return GBufferView(
            mask=hit.reshape(H, W),
            cn_normal=cn_normal,
            cn_depth=cn_depth,
            fg_idx=fg_idx,
            fg_valid=jnp.asarray(valid_np),
            fg_pos=pos[fg_idx],
            fg_normal=normal[fg_idx],
            fg_viewdir=viewdir[fg_idx],
            fg_tri=tri[fg_idx],
            fg_bary=bary[fg_idx],
            fg_uv=uv_interp[fg_idx],
        )

    # ------------------------------------------------------------------
    def shade_view(
        self,
        geo_params: Dict[str, Any],
        gb: GBufferView,
        env_id,
        rng: jax.Array,
        is_train: bool = True,
        height: Optional[int] = None,
        width: Optional[int] = None,
        light_table: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """The per-step differentiable path: field query + shade + scatter.
        Jit-safe (all fixed shapes, rng explicit)."""
        H, W = gb.mask.shape if height is None else (height, width)
        k_jit, k_shade = jax.random.split(rng)

        # tangent jitter for the smoothness regularizer
        # (raytracing_renderer.py:161-173)
        x = uops.get_orthogonal_directions(gb.fg_normal)
        y = jnp.cross(gb.fg_normal, x)
        P = gb.fg_pos.shape[0]
        ka, ke = jax.random.split(k_jit)
        ang = jax.random.uniform(ka, (P, 1)) * 2.0 * jnp.pi
        if self.cfg.change_type == "gaussian":
            eps = jax.random.normal(ke, (P, 1)) * self.cfg.change_eps
        else:
            eps = jnp.full((P, 1), self.cfg.change_eps)
        change = (jnp.cos(ang) * x + jnp.sin(ang) * y) * eps

        if getattr(self.geometry.cfg, "n_input_dims", 3) == 2:
            # UV-space field (reference raytracing_renderer.py:177-181)
            ku = jax.random.fold_in(k_jit, 1)
            feats = self.geometry.apply(geo_params, gb.fg_uv)
            feats_jitter = self.geometry.apply(
                geo_params, gb.fg_uv + jax.random.normal(ku, gb.fg_uv.shape) * 0.005
            )
        else:
            feats = self.geometry.apply(geo_params, gb.fg_pos)
            feats_jitter = self.geometry.apply(geo_params, gb.fg_pos + change)

        shade_out, mat_reg = self.material(
            gb.fg_pos, feats, feats_jitter, gb.fg_viewdir, gb.fg_normal,
            env_id, k_shade, is_train=is_train, mask=gb.fg_valid,
            vis_data=(gb.fg_tri, gb.fg_bary), light_table=light_table,
        )

        maskf = gb.mask.reshape(-1, 1).astype(jnp.float32)

        def composite(fg_vals, background):
            C = fg_vals.shape[-1]
            img = jnp.zeros((H * W, C))
            vals = jnp.where(gb.fg_valid[:, None], fg_vals, 0.0)
            img = img.at[gb.fg_idx].add(vals)  # scatter-add; padded lanes hit idx 0 with 0
            img = img * maskf + background * (1.0 - maskf)
            return img.reshape(H, W, C)

        white = jnp.ones((1, 3))
        out = {
            "comp_rgb": composite(shade_out["color"], white),
            "opacity": gb.mask[..., None].astype(jnp.float32),
            "comp_depth": gb.cn_depth,
            "comp_normal": gb.cn_normal,
            "albedo": composite(shade_out["albedo"], white),
            "metalness": composite(shade_out["metalness"], jnp.ones((1, 1))),
            "roughness": composite(shade_out["roughness"], jnp.ones((1, 1))),
            "specular_light": composite(shade_out["specular_light"], white),
            "diffuse_light": composite(shade_out["diffuse_light"], white),
            "specular_color": composite(shade_out["specular_color"], white),
            "diffuse_color": composite(shade_out["diffuse_color"], white),
            "loss_mat_reg": mat_reg,
        }
        return out
