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

import functools
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


def _views_rays(elev, azim, dist, fovy_deg, H: int, W: int):
    """Device-side camera rays for a batch of spherical cameras. Matches
    data/cameras.camera_rays_and_matrices (pixel centers, cx=W/2, y-flip)."""
    pos = uops.camera_position_from_spherical(elev, azim, dist)  # [c,3]
    c2w = uops.get_c2w(pos)
    focal = 0.5 * H / jnp.tan(0.5 * jnp.deg2rad(fovy_deg))  # [c]
    i = jnp.arange(W, dtype=jnp.float32) + 0.5
    j = jnp.arange(H, dtype=jnp.float32) + 0.5
    ii, jj = jnp.meshgrid(i, j, indexing="xy")
    base = jnp.stack([ii - W / 2.0, -(jj - H / 2.0)], axis=-1)  # [H,W,2]
    c = pos.shape[0]
    dirs = jnp.concatenate(
        [base[None] / focal[:, None, None, None],
         -jnp.ones((c, H, W, 1), jnp.float32)],
        axis=-1,
    )
    rays_o, rays_d = uops.get_rays(dirs, c2w, keepdim=True)  # [c,H,W,3]
    return pos, c2w, rays_o, rays_d


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _cast_views(bvh, elev, azim, dist, fovy_deg, *, H: int, W: int):
    """Cast a batch of views' camera rays in one dispatch."""
    _, _, rays_o, rays_d = _views_rays(elev, azim, dist, fovy_deg, H, W)
    out = bvh_lib.cast_rays_chunked(
        bvh, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
    )
    c = elev.shape[0]
    return {k: out[k].reshape(c, H * W) for k in ("face", "t", "u", "v")}


def _assemble_one(mesh_data, P: int, H: int, W: int, has_uv: bool,
                  face, t, u, v, ro, rd, w2c_):
    """One view's G-buffer assembly from cast results, fully on device. The
    reference's boolean ``selector`` fancy-indexing
    (raytracing_renderer.py:126-207) and the round-1 host-side np.nonzero
    both become a device sort-compaction to a static pixel budget P;
    foreground overflow is strided (the round-1 host path used np.linspace
    subsampling — same policy)."""
    t_pos_idx, v_nrm, v_tex, t_tex_idx = mesh_data
    HW = H * W
    hit = face >= 0
    f_safe = jnp.maximum(face, 0)
    u_ = u[:, None]
    v_ = v[:, None]
    tri_all = t_pos_idx[f_safe]  # [HW,3]
    n_all = uops.safe_normalize(
        (1 - u_ - v_) * v_nrm[tri_all[:, 0]]
        + u_ * v_nrm[tri_all[:, 1]]
        + v_ * v_nrm[tri_all[:, 2]]
    )
    # controlnet-style view-space normal (raytracing_renderer.py:326-331)
    n_view = uops.safe_normalize(
        jnp.einsum("nk,ik->ni", n_all, w2c_[:3, :3], precision="highest")
    )
    cn = 0.5 * (n_view + 1.0)
    cn = cn.at[:, 0].set(1.0 - cn[:, 0])  # bae convention x-flip
    cn_normal = jnp.where(hit[:, None], cn, jnp.asarray([0.5, 0.5, 1.0]))
    # inverse-normalized depth (raytracing_renderer.py:333-343)
    min_val = 0.3
    inv = 1.0 / (t + 1e-6)
    dmax = jnp.max(jnp.where(hit, inv, -jnp.inf))
    dmin = jnp.min(jnp.where(hit, inv, jnp.inf))
    dn = (1 - min_val) * (inv - dmin) / (dmax - dmin + 1e-6) + min_val
    cn_depth = jnp.where(hit, dn, 0.0)

    # fixed-budget foreground compaction: ascending sort of hit pixel
    # indices (misses sort to HW); strided pick when count > P
    idxs = jnp.where(hit, jnp.arange(HW, dtype=jnp.int32), HW)
    srt = jnp.sort(idxs)
    count = jnp.sum(hit)
    stride = jnp.maximum(count, P).astype(jnp.float32) / P
    sel = jnp.floor(jnp.arange(P, dtype=jnp.float32) * stride).astype(jnp.int32)
    srt_p = srt[jnp.clip(sel, 0, HW - 1)]
    valid = srt_p < HW
    fg_idx = jnp.where(valid, srt_p, 0).astype(jnp.int32)

    tg = t[fg_idx]
    ug = u[fg_idx][:, None]
    vg = v[fg_idx][:, None]
    fg_face = f_safe[fg_idx]
    tri = t_pos_idx[fg_face]
    nrm = uops.safe_normalize(
        (1 - ug - vg) * v_nrm[tri[:, 0]] + ug * v_nrm[tri[:, 1]] + vg * v_nrm[tri[:, 2]]
    )
    up = jnp.asarray([0.0, 0.0, 1.0])
    nrm = jnp.where(valid[:, None], nrm, up)
    rof = ro.reshape(-1, 3)[fg_idx]
    rdf = rd.reshape(-1, 3)[fg_idx]
    fg_pos = jnp.where(valid[:, None], rof + tg[:, None] * rdf, 0.0)
    fg_viewdir = jnp.where(valid[:, None], -uops.safe_normalize(rdf), up)
    bary = jnp.concatenate([1.0 - ug - vg, ug, vg], axis=-1)
    bary = jnp.where(valid[:, None], bary, jnp.asarray([1.0, 0.0, 0.0]))
    if has_uv:
        tt = t_tex_idx[fg_face]
        fg_uv = (1 - ug - vg) * v_tex[tt[:, 0]] + ug * v_tex[tt[:, 1]] + vg * v_tex[tt[:, 2]]
        fg_uv = jnp.where(valid[:, None], fg_uv, 0.0)
    else:
        fg_uv = jnp.zeros((P, 2), jnp.float32)
    return GBufferView(
        mask=hit.reshape(H, W),
        cn_normal=cn_normal.reshape(H, W, 3).astype(jnp.float16),
        cn_depth=cn_depth.reshape(H, W, 1).astype(jnp.float16),
        fg_idx=fg_idx,
        fg_valid=valid,
        fg_pos=fg_pos,
        fg_normal=nrm,
        fg_viewdir=fg_viewdir,
        fg_tri=tri,
        fg_bary=bary,
        fg_uv=fg_uv,
    )


@functools.partial(jax.jit, static_argnames=("P", "H", "W", "has_uv"))
def _assemble_views(
    mesh_data, face, t, u, v, elev, azim, dist, fovy_deg,
    *, P: int, H: int, W: int, has_uv: bool,
):
    """Batched (vmapped over views) G-buffer assembly for spherical
    look-at-origin cameras (the fixed-camera prerender path)."""
    _, c2w, rays_o, rays_d = _views_rays(elev, azim, dist, fovy_deg, H, W)
    w2c = uops.get_w2c(c2w)
    one = functools.partial(_assemble_one, mesh_data, P, H, W, has_uv)
    return jax.vmap(one)(face, t, u, v, rays_o, rays_d, w2c)


@functools.partial(jax.jit, static_argnames=("P", "H", "W", "has_uv"))
def _gbuffer_from_rays(
    bvh, mesh_data, rays_o, rays_d, w2c,
    *, P: int, H: int, W: int, has_uv: bool,
):
    """One camera with ARBITRARY rays (perturbed c2w, random-camera mode):
    cast + assemble in a single fixed-shape dispatch, jitted once per
    (P, H, W) — the per-step path for use_fix_views=false."""
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)
    out = bvh_lib.cast_rays_chunked(bvh, ro, rd)
    return _assemble_one(
        mesh_data, P, H, W, has_uv,
        out["face"], out["t"], out["u"], out["v"], ro, rd, w2c,
    )


def _edge_blend(img: jnp.ndarray, mask_f: jnp.ndarray, background) -> jnp.ndarray:
    """1-pixel analytic-antialias substitute (reference applies nvdiffrast's
    antialias to comp_rgb and the normal map, raytracing_renderer.py:201,
    utils/rasterize.py:72-78; coverage GRADIENTS are not needed — DreamMat
    optimizes materials only, geometry is frozen). Foreground colors are
    dilated one pixel (masked 3x3 mean) and blended against the background
    with the 3x3 soft coverage, so silhouettes feed the VAE/ControlNet a
    smooth image statistic instead of a hard binary edge."""
    m = mask_f[..., None]  # [H,W,1]
    win = lambda x: jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (3, 3, 1), (1, 1, 1), "SAME"
    )
    wsum = win(m)
    neigh = win(img * m) / jnp.maximum(wsum, 1e-6)
    filled = img * m + neigh * (1.0 - m)
    cov = jnp.where(m > 0.5, 1.0, wsum / 9.0)  # interior pixels stay exact
    return filled * cov + background * (1.0 - cov)


@dreammat_tpu.register("raytracing-renderer")
class RaytraceRenderer(BaseObject):
    @dataclass
    class Config:
        context_type: str = "jax"  # accepted for config parity; unused
        change_type: str = "gaussian"
        change_eps: float = 0.05
        antialias: bool = True  # 1-px edge blend on comp_rgb / comp_normal
        # "view": the smoothness-reg jitter offsets are drawn once per view so
        # BOTH field queries hit fixed points -> scatter-free table backward
        # (ops/hashgrid.py view-static encode). "step" resamples the jitter
        # every step like the reference (raytracing_renderer.py:161-173) and
        # pays the slow autodiff scatter for both queries.
        jitter_resample: str = "view"
        pixel_budget: int = 0  # 0 => auto (max fg count, padded)
        # "baked": per-vertex octahedral visibility baked once per mesh (fast
        # TPU default); "raytrace": exact per-step BVH rays (reference
        # parity); "none": no shadow rays
        visibility_mode: str = "baked"
        visibility_oct_res: int = 16
        # >1 casts supersample^2 jittered rays per octahedral bin and stores
        # the fractional bin visibility — reduces direction-space aliasing
        # under hard self-occlusion (see ops/visibility.py); costs
        # supersample^2 x more one-time bake rays.
        visibility_supersample: int = 1
        # midpoint-subdivision levels applied to the renderer's mesh before
        # BVH/bake/G-buffers: 4x spatial visibility-sample density per level
        # on the SAME surface (mesh.py:subdivide_mesh). The per-vertex bake
        # interpolated across coarse triangles is the binding approximation
        # under hard self-occlusion (torus-class grad-cos gap); density
        # closes it. Costs 4^n bake rays/table rows, one-time.
        visibility_subdiv: int = 0
        visibility_subdiv_max_verts: int = 1 << 20

    cfg: Config

    def configure(self, geometry, material, background) -> None:
        self.geometry = geometry
        self.material = material
        self.background = background
        self.mesh: Mesh = geometry.isosurface()
        if self.cfg.visibility_subdiv > 0 and self.cfg.visibility_mode == "baked":
            from dreammat_tpu.models.mesh import subdivide_mesh

            self.mesh = subdivide_mesh(
                self.mesh, self.cfg.visibility_subdiv,
                max_verts=self.cfg.visibility_subdiv_max_verts,
            )
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
                supersample=self.cfg.visibility_supersample,
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
    def build_gbuffers_batched(
        self,
        cam,  # data.cameras.CameraSet
        height: int,
        width: int,
        pixel_budget: Optional[int] = None,
        view_chunk: int = 8,
    ):
        """All views' G-buffers in a handful of device dispatches.

        The round-1 per-view loop cost ~7 s/view on hardware — almost all of
        it per-view host round-trips through the device tunnel (the casting
        itself is ~0.1 s/view of VPU math). Here rays are generated ON
        device from the spherical camera parameters, all views are cast in
        view-chunked dispatches, the only host pull is the [Nv] foreground
        counts, and assembly (including the foreground compaction that used
        host np.nonzero) happens in one vmapped jit per chunk.

        Returns (gbuffers, stacked): a per-view GBufferView list (device
        slices) and the stacked GBufferView-of-arrays ([Nv, ...] leaves)."""
        Nv = len(cam)
        vc = min(view_chunk, Nv)
        n_pad = (-Nv) % vc
        def cam_arr(x):
            x = np.asarray(x, dtype=np.float32)
            return jnp.asarray(np.concatenate([x, np.repeat(x[-1:], n_pad, 0)]))
        elev = cam_arr(cam.elevation_deg)
        azim = cam_arr(cam.azimuth_deg)
        dist = cam_arr(cam.camera_distances)
        fovy = cam_arr(cam.fovy_deg)
        Np = Nv + n_pad

        casts = []
        for s in range(0, Np, vc):
            sl = slice(s, s + vc)
            casts.append(_cast_views(
                self.bvh, elev[sl], azim[sl], dist[sl], fovy[sl],
                H=height, W=width,
            ))
        cast = {k: jnp.concatenate([c[k] for c in casts]) for k in casts[0]}

        counts = np.asarray(jnp.sum(cast["face"] >= 0, axis=1))[:Nv]
        P = pixel_budget or self.cfg.pixel_budget
        if P is None or P <= 0:
            P = int(np.ceil(max(int(counts.max()), 1) / 1024) * 1024)
        if int(counts.max()) > P:
            dreammat_tpu.warn(
                "foreground pixels (%d) exceed pixel budget (%d); subsampling",
                int(counts.max()), P,
            )

        mesh_data = (
            self.mesh.t_pos_idx, self.mesh.v_nrm,
            self.mesh.v_tex, self.mesh.t_tex_idx,
        )
        has_uv = self.mesh.v_tex is not None and self.mesh.t_tex_idx is not None
        outs = []
        for s in range(0, Np, vc):
            sl = slice(s, s + vc)
            outs.append(_assemble_views(
                mesh_data,
                cast["face"][sl], cast["t"][sl], cast["u"][sl], cast["v"][sl],
                elev[sl], azim[sl], dist[sl], fovy[sl],
                P=P, H=height, W=width, has_uv=has_uv,
            ))
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs)[:Nv], *outs
        )
        gbuffers = [
            jax.tree_util.tree_map(lambda x, i=i: x[i], stacked) for i in range(Nv)
        ]
        return gbuffers, stacked

    # ------------------------------------------------------------------
    def build_gbuffer_from_rays(
        self,
        rays_o: jnp.ndarray,   # [H,W,3]
        rays_d: jnp.ndarray,   # [H,W,3]
        w2c: jnp.ndarray,      # [4,4]
        pixel_budget: int,
    ) -> GBufferView:
        """Fully-device G-buffer for one arbitrary camera (random-camera
        mode): fixed pixel budget => one jitted shape across all steps."""
        H, W = rays_o.shape[:2]
        mesh_data = (
            self.mesh.t_pos_idx, self.mesh.v_nrm,
            self.mesh.v_tex, self.mesh.t_tex_idx,
        )
        has_uv = self.mesh.v_tex is not None and self.mesh.t_tex_idx is not None
        return _gbuffer_from_rays(
            self.bvh, mesh_data, rays_o, rays_d, w2c,
            P=pixel_budget, H=H, W=W, has_uv=has_uv,
        )

    # ------------------------------------------------------------------
    def _jitter_points(self, gb: GBufferView, key: jax.Array):
        """Smoothness-reg query points (raytracing_renderer.py:161-181):
        tangent jitter in 3D mode, gaussian uv noise in 2D mode."""
        if getattr(self.geometry.cfg, "n_input_dims", 3) == 2:
            return gb.fg_uv + jax.random.normal(key, gb.fg_uv.shape) * 0.005
        x = uops.get_orthogonal_directions(gb.fg_normal)
        y = jnp.cross(gb.fg_normal, x)
        P = gb.fg_pos.shape[0]
        ka, ke = jax.random.split(key)
        ang = jax.random.uniform(ka, (P, 1)) * 2.0 * jnp.pi
        if self.cfg.change_type == "gaussian":
            eps = jax.random.normal(ke, (P, 1)) * self.cfg.change_eps
        else:
            eps = jnp.full((P, 1), self.cfg.change_eps)
        change = (jnp.cos(ang) * x + jnp.sin(ang) * y) * eps
        return gb.fg_pos + change

    def build_enc_maps(self, gb: GBufferView, key: jax.Array):
        """Per-view (main, jitter) EncodeMaps for the scatter-free field
        backward. The jitter draw is fixed per view (cfg.jitter_resample
        == "view"); returns None when the config asks for per-step jitter."""
        if self.cfg.jitter_resample != "view":
            return None
        main_pts = (gb.fg_uv if getattr(self.geometry.cfg, "n_input_dims", 3) == 2
                    else gb.fg_pos)
        return (
            self.geometry.build_static_maps(main_pts),
            self.geometry.build_static_maps(self._jitter_points(gb, key)),
        )

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
        enc_maps=None,
        pixel_vis: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """The per-step differentiable path: field query + shade + scatter.
        Jit-safe (all fixed shapes, rng explicit). ``pixel_vis`` [P, oct^2]
        switches the MC estimator's visibility source from the per-vertex
        barycentric lookup to the per-pixel baked table (mc_pixel)."""
        H, W = gb.mask.shape if height is None else (height, width)
        k_jit, k_shade = jax.random.split(rng)

        if enc_maps is not None:
            # view-static queries: fixed points -> scatter-free table grads
            feats = self.geometry.apply_static(geo_params, enc_maps[0])
            feats_jitter = self.geometry.apply_static(geo_params, enc_maps[1])
        elif getattr(self.geometry.cfg, "n_input_dims", 3) == 2:
            # UV-space field (reference raytracing_renderer.py:177-181)
            ku = jax.random.fold_in(k_jit, 1)
            feats = self.geometry.apply(geo_params, gb.fg_uv)
            feats_jitter = self.geometry.apply(
                geo_params, self._jitter_points(gb, ku)
            )
        else:
            feats = self.geometry.apply(geo_params, gb.fg_pos)
            feats_jitter = self.geometry.apply(
                geo_params, self._jitter_points(gb, k_jit)
            )

        if pixel_vis is not None:
            from dreammat_tpu.ops.visibility import PixelVisibility

            vis_data = PixelVisibility(
                pixel_vis, self.cfg.visibility_oct_res)
        else:
            vis_data = (gb.fg_tri, gb.fg_bary)
        shade_out, mat_reg = self.material(
            gb.fg_pos, feats, feats_jitter, gb.fg_viewdir, gb.fg_normal,
            env_id, k_shade, is_train=is_train, mask=gb.fg_valid,
            vis_data=vis_data, light_table=light_table,
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
        comp_rgb = composite(shade_out["color"], white)
        comp_normal = gb.cn_normal.astype(jnp.float32)
        if self.cfg.antialias:
            mf = gb.mask.astype(jnp.float32)
            comp_rgb = _edge_blend(comp_rgb, mf, white)
            comp_normal = _edge_blend(
                comp_normal, mf, jnp.asarray([0.5, 0.5, 1.0])
            )
        out = {
            "comp_rgb": comp_rgb,
            "opacity": gb.mask[..., None].astype(jnp.float32),
            "comp_depth": gb.cn_depth.astype(jnp.float32),
            "comp_normal": comp_normal,
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
