"""Baked per-vertex visibility (PRT-style) for Monte-Carlo shading.

The reference traces pixel x 328 visibility rays through a CUDA BVH *every
optimization step* (dreammat_material.py:490-507) — tens of millions of
irregular rays per step. On TPU the geometry is frozen and the cameras are
fixed, so visibility vis(x, omega) is a static function of the mesh: we bake
it ONCE per mesh on an octahedral direction grid at every vertex, and the
hot loop becomes three gathers + a barycentric mix (soft shadows for free).

Modes (renderer config ``visibility_mode``):
- "raytrace": exact per-step BVH traversal (reference parity)
- "baked":    this module (default for training throughput)
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dreammat_tpu.ops import bvh as bvh_lib

# default direction-filter for table lookups ("bilinear" | "nearest");
# DREAMMAT_VIS_FILTER overrides for A/B measurement (quantify_fastpath)
DEFAULT_FILTER = os.environ.get("DREAMMAT_VIS_FILTER", "bilinear")


class BakedVisibility(NamedTuple):
    table: jnp.ndarray  # [V, O*O] float (1 = unoccluded)
    oct_res: int


class PixelVisibility(NamedTuple):
    """Per-PIXEL octahedral visibility for one G-buffer.

    The per-vertex tables interpolate visibility barycentrically across a
    triangle — on self-occluding geometry the shading point's true horizon
    differs from the blend of its 3 corners', and that spatial error is
    what decorrelates the baked-MC material gradient (torus grad_cos 0.28
    vs the 0.75 exact-vs-exact floor; ROADMAP #41). The cameras are FIXED
    (128-view rig), so visibility at every G-buffer pixel is a static
    function of the mesh: bake it once per view (P x O^2 rays through the
    same BVH as the exact path) and the only remaining error is
    directional binning at the true point."""

    table: jnp.ndarray  # [P, O*O] float (1 = unoccluded)
    oct_res: int


# ---------------------------------------------------------------------------
# octahedral direction <-> uv mapping
# ---------------------------------------------------------------------------

def dir_to_oct_uv(d: jnp.ndarray) -> jnp.ndarray:
    """Unit dirs [...,3] -> octahedral uv in [0,1]^2."""
    n = d / (jnp.abs(d[..., 0:1]) + jnp.abs(d[..., 1:2]) + jnp.abs(d[..., 2:3]) + 1e-12)
    xy = n[..., :2]
    neg = n[..., 2:3] < 0
    folded = (1.0 - jnp.abs(xy[..., ::-1])) * jnp.sign(jnp.where(xy == 0, 1.0, xy))
    xy = jnp.where(neg, folded, xy)
    return xy * 0.5 + 0.5


def oct_uv_to_dir(uv: jnp.ndarray) -> jnp.ndarray:
    """Octahedral uv in [0,1]^2 -> unit dirs [...,3]."""
    xy = uv * 2.0 - 1.0
    z = 1.0 - jnp.abs(xy[..., 0:1]) - jnp.abs(xy[..., 1:2])
    folded = (1.0 - jnp.abs(xy[..., ::-1])) * jnp.sign(jnp.where(xy == 0, 1.0, xy))
    xy = jnp.where(z < 0, folded, xy)
    d = jnp.concatenate([xy, z], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def dir_to_bin(d: jnp.ndarray, oct_res: int) -> jnp.ndarray:
    uv = dir_to_oct_uv(d)
    x = jnp.clip((uv[..., 0] * oct_res).astype(jnp.int32), 0, oct_res - 1)
    y = jnp.clip((uv[..., 1] * oct_res).astype(jnp.int32), 0, oct_res - 1)
    return y * oct_res + x


def oct_bilinear_bins_weights(d: jnp.ndarray, oct_res: int):
    """Bilinear texel footprint on the octahedral map: bins [...,4] int32 and
    weights [...,4] (sum=1) for unit dirs [...,3].

    Directional QUANTIZATION of the nearest-bin lookup — not per-vertex
    spatial density — is the dominant baked-vs-exact error on self-occluding
    geometry (hardware-measured: doubling oct_res cut shading RMSE 24% while
    4x vertex subdivision moved it 0.3%). Bilinear filtering removes the
    first-order aliasing at 4 gathers instead of 1.

    Out-of-square neighbors use the octahedral mirror-with-flip wrap rule
    (crossing an edge re-enters mirrored, with the other axis flipped —
    the square-tiling symmetry of the octahedral map). Verified: bilinear
    direction-field reconstruction error < 0.5 texel pitch everywhere,
    including across all four edges and corners."""
    O = oct_res
    uv = dir_to_oct_uv(d)
    x = uv[..., 0] * O - 0.5
    y = uv[..., 1] * O - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    ix = jnp.stack([x0, x0 + 1, x0, x0 + 1], axis=-1)
    iy = jnp.stack([y0, y0, y0 + 1, y0 + 1], axis=-1)
    over_x = (ix < 0) | (ix > O - 1)
    ix = jnp.where(ix < 0, -1 - ix, jnp.where(ix > O - 1, 2 * O - 1 - ix, ix))
    iy = jnp.where(over_x, O - 1 - iy, iy)
    over_y = (iy < 0) | (iy > O - 1)
    iy = jnp.where(iy < 0, -1 - iy, jnp.where(iy > O - 1, 2 * O - 1 - iy, iy))
    ix = jnp.where(over_y, O - 1 - ix, ix)
    w = jnp.concatenate(
        [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy], axis=-1
    )
    return iy * O + ix, w


# ---------------------------------------------------------------------------
# bake
# ---------------------------------------------------------------------------

def bake_vertex_visibility(
    bvh: bvh_lib.FlatBVH,
    v_pos: jnp.ndarray,
    v_nrm: jnp.ndarray,
    oct_res: int = 16,
    eps: float = 1e-3,
    chunk: int = 1 << 16,
    supersample: int = 1,
) -> BakedVisibility:
    """Cast V x (oct_res*supersample)^2 rays once; per bin the table stores
    the FRACTION of its supersample^2 sub-rays that reach the environment
    (supersample=1 keeps the original binary bin). Fractional bins matter
    under hard self-occlusion (torus class): a bin straddling an occluder
    edge otherwise snaps to fully-lit or fully-dark, and that direction-space
    aliasing is the dominant baked-vs-exact gradient error. Rays into the
    surface (below the tangent plane) never matter for the shading
    estimators (NoL weights them to ~0) so their value is harmless."""
    V = v_pos.shape[0]
    s = max(int(supersample), 1)
    N = oct_res * s
    xs = (jnp.arange(N, dtype=jnp.float32) + 0.5) / N
    uu, vv = jnp.meshgrid(xs, xs, indexing="xy")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)  # [N2,2] order y*N+x
    dirs = oct_uv_to_dir(uv)  # [N2,3]
    N2 = N * N

    # point-chunked: a per-PIXEL bake at flagship scale is ~640k points x
    # 256 bins = 164M rays — one monolithic cast's Morton-reorder sort
    # workspace blew the 16 GB compile budget (round-5 mc-pixel regime).
    # Slices keep each cast at <= point_chunk*N2 rays.
    point_chunk = max(1, (chunk * 64) // N2)
    tables = []
    for i in range(0, V, point_chunk):
        vp = v_pos[i:i + point_chunk]
        vn = v_nrm[i:i + point_chunk]
        c = vp.shape[0]
        origins = (vp + vn * eps)[:, None, :] + dirs[None, :, :] * eps
        rays_o = origins.reshape(-1, 3)
        rays_d = jnp.broadcast_to(dirs[None], (c, N2, 3)).reshape(-1, 3)
        out = bvh_lib.cast_rays_chunked(bvh, rays_o, rays_d, chunk=chunk)
        vis = (~out["hit"]).astype(jnp.float32).reshape(c, oct_res, s, oct_res, s)
        tables.append(
            vis.mean(axis=(2, 4)).reshape(c, oct_res * oct_res).astype(jnp.float16)
        )
    table = tables[0] if len(tables) == 1 else jnp.concatenate(tables)
    return BakedVisibility(table=table, oct_res=oct_res)


def self_occlusion_fraction(
    baked: BakedVisibility, v_nrm: jnp.ndarray, cos_margin: float = 0.1
) -> float:
    """Fraction of UPPER-hemisphere table bins that are occluded — a cheap
    static probe for whether this mesh self-shadows at all.

    Below-tangent-plane bins are excluded (on any closed mesh they hit the
    surface itself, so counting them would flag a plain sphere); a convex
    mesh scores ~0, a torus scores well above 1%. Used to auto-enable the
    fast-path fidelity check only on meshes where prefiltering can actually
    fail (datamodule fastpath_check="auto")."""
    dirs, _ = oct_bin_geometry(baked.oct_res)
    up = (v_nrm @ jnp.asarray(dirs).T) > cos_margin  # [V, O2]
    occ = (baked.table.astype(jnp.float32) < 0.5) & up
    denom = jnp.maximum(jnp.sum(up), 1)
    return float(jnp.sum(occ) / denom)


# ---------------------------------------------------------------------------
# lookup
# ---------------------------------------------------------------------------

def lookup_visibility(
    baked: BakedVisibility,
    tri_verts: jnp.ndarray,   # [P,3] vertex indices of each pixel's triangle
    bary: jnp.ndarray,        # [P,3] barycentric weights
    directions: jnp.ndarray,  # [P,S,3]
    filter_mode: str | None = None,
) -> jnp.ndarray:
    """Soft visibility [P,S]: barycentric mix of the 3 vertex tables sampled
    at each direction — bilinearly over the octahedral bins by default (see
    oct_bilinear_bins_weights; 4 gathers), nearest-bin with
    filter_mode="nearest" (1 gather, first-order directional aliasing).

    The result carries NO gradient (stop_gradient): the exact estimator's
    visibility is a boolean ray hit through ``jnp.where`` — autodiff sees a
    constant multiplier, zero derivative a.e. The bilinear lookup, if left
    differentiable, injects a phantom d(vis)/d(direction) term near
    horizons (vis swings 0->1 over ~1 bin) that the reference's gradient
    (dreammat_material.py:490-507, hard CUDA-ray visibility) never
    contains; stop_gradient removes it to match reference gradient
    semantics. Measured effect on the torus material-gradient metric is
    negligible (grad_cos_mc 0.2831 -> 0.2832, tools/quantify_fastpath.py)
    — the remaining gap vs the exact-vs-exact floor (~0.75) has a
    different cause (see ROADMAP #41). DREAMMAT_VIS_GRAD=smooth keeps the
    term for A/B."""
    if filter_mode is None:
        filter_mode = DEFAULT_FILTER
    t = baked.table.astype(jnp.float32)
    if filter_mode == "bilinear":
        bins4, w4 = oct_bilinear_bins_weights(directions, baked.oct_res)  # [P,S,4]
        P, S = bins4.shape[:2]
        bins = bins4.reshape(P, S * 4)
    else:
        bins = dir_to_bin(directions, baked.oct_res)  # [P,S]
    v0 = jnp.take_along_axis(t[tri_verts[:, 0]], bins, axis=-1)  # [P,S(*4)]
    v1 = jnp.take_along_axis(t[tri_verts[:, 1]], bins, axis=-1)
    v2 = jnp.take_along_axis(t[tri_verts[:, 2]], bins, axis=-1)
    out = bary[:, 0:1] * v0 + bary[:, 1:2] * v1 + bary[:, 2:3] * v2
    if filter_mode == "bilinear":
        out = jnp.sum(out.reshape(P, S, 4) * w4, axis=-1)
    return _postprocess_vis(out)


def _postprocess_vis(out: jnp.ndarray) -> jnp.ndarray:
    """Shared tail of every table lookup: optional binarization A/B and the
    reference-parity stop_gradient (see lookup_visibility docstring)."""
    if os.environ.get("DREAMMAT_VIS_BIN"):
        # A/B experiment (ROADMAP #41): binarize the per-sample lookup so
        # its statistics match the exact estimator's hard 0/1 hits —
        # replaces horizon softening with a decision boundary
        out = (out > 0.5).astype(jnp.float32)
    if os.environ.get("DREAMMAT_VIS_GRAD") != "smooth":
        out = jax.lax.stop_gradient(out)
    return out


def bake_pixel_visibility(
    bvh: bvh_lib.FlatBVH,
    pts: jnp.ndarray,      # [P,3] G-buffer shading points
    normals: jnp.ndarray,  # [P,3]
    oct_res: int = 16,
    eps: float = 1e-3,
    chunk: int = 1 << 16,
    supersample: int = 1,
) -> PixelVisibility:
    """Bake an octahedral visibility table AT EACH G-BUFFER PIXEL.

    Same caster and bin layout as :func:`bake_vertex_visibility`, evaluated
    at shading points instead of vertices — the spatial-interpolation error
    of the per-vertex tables vanishes. One-time cost per (mesh, view):
    P x (oct_res*supersample)^2 rays; with the fixed 128-camera rig the
    result is cacheable for the whole optimization (~P*O^2 f16 per view).
    Background pixels (mask handled by the caller) bake garbage harmlessly
    — their lights are zeroed downstream."""
    bv = bake_vertex_visibility(
        bvh, pts, normals, oct_res=oct_res, eps=eps, chunk=chunk,
        supersample=supersample,
    )
    return PixelVisibility(table=bv.table, oct_res=oct_res)


def lookup_visibility_pixel(
    baked: PixelVisibility,
    directions: jnp.ndarray,  # [P,S,3]
    filter_mode: str | None = None,
) -> jnp.ndarray:
    """Per-sample visibility [P,S] from a per-pixel table — row i of the
    table belongs to pixel i (no barycentric mixing). Same directional
    filtering, binarization A/B, and stop_gradient semantics as
    :func:`lookup_visibility`."""
    if filter_mode is None:
        filter_mode = DEFAULT_FILTER
    t = baked.table.astype(jnp.float32)  # [P, O2]
    P, S = directions.shape[:2]
    if filter_mode == "bilinear":
        bins4, w4 = oct_bilinear_bins_weights(directions, baked.oct_res)
        v = jnp.take_along_axis(t, bins4.reshape(P, S * 4), axis=-1)
        out = jnp.sum(v.reshape(P, S, 4) * w4, axis=-1)
    else:
        bins = dir_to_bin(directions, baked.oct_res)  # [P,S]
        out = jnp.take_along_axis(t, bins, axis=-1)
    return _postprocess_vis(out)


# ---------------------------------------------------------------------------
# shadowed-radiance cache: env x visibility fused per vertex
# ---------------------------------------------------------------------------

def bake_shadowed_radiance(
    baked: BakedVisibility, envs: jnp.ndarray, supersample: int = 4
) -> jnp.ndarray:
    """L_vis[V, O2, E*3] = mean_env_e(bin) * vis[v, bin]: the fused
    env x visibility cache, laid out with ALL environments in the channel
    axis so one gather per vertex fetches every environment's shadowed
    radiance at once (gather count is independent of env count, and the
    wide row uses the TPU lanes efficiently). float16.

    The per-bin radiance is the env AVERAGED over supersample^2 points per
    bin (not the bin-center point sample): a sun smaller than a bin would
    otherwise alias to the full sun radiance over the whole bin, biasing
    every downstream irradiance/prefilter integral."""
    from dreammat_tpu.ops import envmap as envmap_lib

    O = baked.oct_res
    s = max(int(supersample), 1)
    N = O * s
    xs = (jnp.arange(N, dtype=jnp.float32) + 0.5) / N
    uu, vv = jnp.meshgrid(xs, xs, indexing="xy")  # axis0 = v(y), axis1 = u(x)
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)
    dirs = oct_uv_to_dir(uv)  # [N2,3]
    env_rad = jax.vmap(lambda e: envmap_lib.sample_equirect_bilinear(e, dirs))(envs)
    E = env_rad.shape[0]
    # [E, N, N, 3] -> bin means [E, O, O, 3] -> [E, O2, 3]
    env_rad = env_rad.reshape(E, O, s, O, s, 3).mean(axis=(2, 4)).reshape(E, O * O, 3)
    O2 = O * O
    flat = jnp.moveaxis(env_rad, 0, 1).reshape(O2, E * 3)
    return (
        flat[None, :, :] * baked.table.astype(jnp.float32)[:, :, None]
    ).astype(jnp.float16)


def lookup_shadowed_radiance_all_envs(
    lvis: jnp.ndarray,       # [V, O2, E*3]
    tri_verts: jnp.ndarray,  # [P,3]
    bary: jnp.ndarray,       # [P,3]
    directions: jnp.ndarray, # [P,S,3]
    oct_res: int,
    filter_mode: str | None = None,
) -> jnp.ndarray:
    """Soft-shadowed incoming radiance for every environment at once:
    returns [P, S, E, 3]. Bilinear over the octahedral bins by default
    (4 gathers; directional aliasing of the fused cache is the same error
    source as the raw visibility table's)."""
    if filter_mode is None:
        filter_mode = DEFAULT_FILTER
    t = lvis.astype(jnp.float32)
    C = t.shape[-1]
    if filter_mode == "bilinear":
        bins4, w4 = oct_bilinear_bins_weights(directions, oct_res)  # [P,S,4]
        P, S = bins4.shape[:2]
        bins = bins4.reshape(P, S * 4)
    else:
        bins = dir_to_bin(directions, oct_res)  # [P,S]
        P, S = bins.shape

    def gather_vertex(vidx):
        return jnp.take_along_axis(t[vidx], bins[..., None], axis=1)  # [P,S(*4),E*3]

    out = (
        bary[:, 0:1, None] * gather_vertex(tri_verts[:, 0])
        + bary[:, 1:2, None] * gather_vertex(tri_verts[:, 1])
        + bary[:, 2:3, None] * gather_vertex(tri_verts[:, 2])
    )
    if filter_mode == "bilinear":
        out = jnp.sum(out.reshape(P, S, 4, C) * w4[..., None], axis=2)
    return out.reshape(P, S, C // 3, 3)


def lookup_shadowed_radiance(
    lvis: jnp.ndarray,       # [V, O2, E*3] fused cache
    tri_verts: jnp.ndarray,
    bary: jnp.ndarray,
    directions: jnp.ndarray,
    oct_res: int,
    env_id: int = 0,
    filter_mode: str | None = None,
) -> jnp.ndarray:
    """One environment's shadowed radiance [P,S,3]."""
    all_envs = lookup_shadowed_radiance_all_envs(
        lvis, tri_verts, bary, directions, oct_res, filter_mode=filter_mode
    )
    return all_envs[:, :, env_id]


# ---------------------------------------------------------------------------
# octahedral-domain convolution bakes (no gathers — pure VPU/MXU math)
# ---------------------------------------------------------------------------

import functools as _functools


def _oct_uv_to_dir_np(uv: np.ndarray) -> np.ndarray:
    """Pure-numpy twin of oct_uv_to_dir (host-side geometry tables must not
    trace — they are built lazily, possibly inside a jit trace)."""
    xy = uv * 2.0 - 1.0
    z = 1.0 - np.abs(xy[..., 0:1]) - np.abs(xy[..., 1:2])
    folded = (1.0 - np.abs(xy[..., ::-1])) * np.sign(np.where(xy == 0, 1.0, xy))
    xy = np.where(z < 0, folded, xy)
    d = np.concatenate([xy, z], axis=-1)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def _oct_grid_areas(N: int) -> np.ndarray:
    """Per-cell solid angles [N,N] (y-major axes) of the N x N octahedral UV
    grid: numerically integrated spherical quad areas (flat-quad
    approximation), normalized to exactly 4pi."""
    xs = np.arange(N + 1, dtype=np.float64) / N
    uu, vv = np.meshgrid(xs, xs, indexing="xy")  # axis0 = v(y), axis1 = u(x)
    uv = np.stack([uu, vv], axis=-1)
    d = _oct_uv_to_dir_np(uv)
    a = d[:-1, :-1]
    b = d[1:, :-1]
    c = d[1:, 1:]
    e = d[:-1, 1:]
    area = 0.5 * np.linalg.norm(np.cross(b - a, e - a), axis=-1)
    area += 0.5 * np.linalg.norm(np.cross(b - c, e - c), axis=-1)
    area *= 4.0 * np.pi / area.sum()
    return area


def _oct_grid_dirs(N: int) -> np.ndarray:
    """Cell-center directions [N,N,3] (y-major axes) of the octahedral grid."""
    cs = (np.arange(N, dtype=np.float64) + 0.5) / N
    cu, cv = np.meshgrid(cs, cs, indexing="xy")
    cuv = np.stack([cu, cv], axis=-1)
    return _oct_uv_to_dir_np(cuv)


@_functools.lru_cache(maxsize=8)
def oct_bin_geometry(oct_res: int, supersample: int = 8):
    """Bin-center directions [O2,3] and per-bin solid angles [O2] (sum=4pi)
    for the octahedral grid, in the same y-major bin order as dir_to_bin.

    Solid angles come from numerically integrating the mapping's Jacobian
    (supersampled spherical quad areas) — the quadrature weights that turn
    sums over bins into integrals over the sphere."""
    area = _oct_grid_areas(oct_res * supersample)
    sa = area.reshape(oct_res, supersample, oct_res, supersample).sum(axis=(1, 3))
    sa = sa.reshape(-1)  # y-major [O2]
    dirs = _oct_grid_dirs(oct_res).reshape(-1, 3)
    return dirs.astype(np.float32), sa.astype(np.float32)


@_functools.lru_cache(maxsize=8)
def oct_bin_subgeometry(oct_res: int, sub: int = 3):
    """Subcell quadrature points grouped by bin: directions [s2, O2, 3] and
    solid angles [s2, O2], y-major bin order. Used to integrate sharp
    kernels (GGX lobes comparable to the bin size) over each bin instead of
    point-sampling them at bin centers."""
    N = oct_res * sub
    area = _oct_grid_areas(N).reshape(oct_res, sub, oct_res, sub)
    dirs = _oct_grid_dirs(N).reshape(oct_res, sub, oct_res, sub, 3)
    # [y, sy, x, sx] -> [sy*sx, y*x]
    sa = np.moveaxis(area, 2, 1).reshape(oct_res * oct_res, sub * sub).T
    dd = np.moveaxis(dirs, 2, 1).reshape(oct_res * oct_res, sub * sub, 3)
    dd = np.moveaxis(dd, 1, 0)
    return dd.astype(np.float32), sa.astype(np.float32)


def bake_vertex_irradiance_conv(
    lvis: jnp.ndarray,   # [V, O2, E*3]
    v_nrm: jnp.ndarray,  # [V, 3]
    oct_res: int,
) -> jnp.ndarray:
    """Per-vertex diffuse irradiance/pi E_d[E, V, 3] as a cosine-kernel
    quadrature over the octahedral bins: E_d = sum_o max(n.d_o,0) sa_o
    L_vis(o) / pi. Same integral the reference estimates with its
    cosine-sampled direction set (dreammat_material.py:554-573,632-641),
    but with zero gathers — every vertex reads its own contiguous lvis row."""
    dirs, sa = oct_bin_geometry(oct_res)
    w = jnp.maximum(v_nrm @ jnp.asarray(dirs).T, 0.0) * jnp.asarray(sa)  # [V,O2]
    out = jnp.einsum("vo,voc->vc", w, lvis.astype(jnp.float32)) / jnp.pi
    V = out.shape[0]
    E = out.shape[-1] // 3
    return jnp.moveaxis(out.reshape(V, E, 3), 1, 0)  # [E,V,3]


def bake_vertex_specular_conv(
    lvis: jnp.ndarray,   # [V, O2, E*3]
    refl: jnp.ndarray,   # [V, 3] unit reflection directions
    alphas,              # (K,) GGX "roughness_sq" levels (TABLE_ALPHAS)
    oct_res: int,
    v_chunk: int = 8192,
    kernel_sub: int = 3,
) -> jnp.ndarray:
    """GGX-prefiltered shadowed radiance S[V, K, E, 3] at each vertex's
    reflection direction, one level per alpha.

    Karis split-sum prefilter (N=V=R) as quadrature over the octahedral
    bins: w_o = integral_bin D_ggx(NoH, alpha) NoL domega (kernel_sub^2
    subcell points per bin — sharp lobes span ~1 bin, so point-sampling D at
    bin centers misallocates mass), S = sum(w L)/sum(w) — the same weighted
    average the importance-sampled estimator converges to (pdf = D/4 cancels
    in the normalization). With V=R the half-vector cosine has the closed
    form NoH = sqrt((1 + R.L)/2). Replaces the per-pixel K*sn-sample
    radiance gather pass (the round-1 prerender bottleneck) with gather-free
    per-vertex math."""
    from dreammat_tpu.models.material import distribution_ggx

    sub_dirs, sub_sa = oct_bin_subgeometry(oct_res, kernel_sub)
    sub_dirs = jnp.asarray(sub_dirs)  # [s2, O2, 3]
    sub_sa = jnp.asarray(sub_sa)      # [s2, O2]
    s2 = sub_dirs.shape[0]
    alphas = jnp.asarray(alphas, dtype=jnp.float32)  # [K]
    V = refl.shape[0]
    O2 = sub_dirs.shape[1]
    C = lvis.shape[-1]
    K = alphas.shape[0]

    pad = (-V) % v_chunk
    refl_p = jnp.concatenate([refl, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))])
    lvis_p = jnp.concatenate([lvis, jnp.zeros((pad, O2, C), lvis.dtype)])

    def chunk_fn(args):
        r, lv = args  # [c,3], [c,O2,C]
        c = r.shape[0]
        w = jnp.zeros((c, K, O2))
        for j in range(s2):  # static unroll; accumulates the bin integral
            RoL = r @ sub_dirs[j].T  # [c,O2]
            NoL = jnp.maximum(RoL, 0.0)
            NoH = jnp.sqrt(jnp.clip((1.0 + RoL) * 0.5, 0.0, 1.0))
            # D squares alpha internally (alpha = roughness^2)
            D = distribution_ggx(NoH[:, None, :], alphas[None, :, None])
            w = w + D * (NoL * sub_sa[j])[:, None, :]
        num = jnp.einsum("vko,voc->vkc", w, lv.astype(jnp.float32))
        den = jnp.sum(w, axis=-1)[..., None] + 1e-8
        return num / den  # [c,K,C]

    out = jax.lax.map(
        chunk_fn,
        (refl_p.reshape(-1, v_chunk, 3), lvis_p.reshape(-1, v_chunk, O2, C)),
    )
    out = out.reshape(-1, K, C)[:V]
    E = C // 3
    return out.reshape(V, K, E, 3)


def bake_vertex_irradiance(
    baked: BakedVisibility,
    lvis: jnp.ndarray,       # [V, O2, E*3]
    v_nrm: jnp.ndarray,      # [V,3]
    diffuse_samples: jnp.ndarray,  # [dn,2] fibonacci (az_unit, el_unit)
) -> jnp.ndarray:
    """Per-vertex diffuse irradiance estimate E_d[E, V, 3]: the reference's
    cosine-set mean of shadowed radiance, evaluated ONCE per mesh in each
    vertex's normal frame instead of per pixel per view. View-independent, so
    all 128 views share it (per-pixel values are barycentric mixes)."""
    from dreammat_tpu.utils import ops as uops

    az = diffuse_samples[:, 0][None, :, None] * (2.0 * jnp.pi)
    el = diffuse_samples[:, 1][None, :, None]
    x = uops.get_orthogonal_directions(v_nrm)
    y = jnp.cross(v_nrm, x)
    el_sqrt = jnp.sqrt(el + 1e-7)
    cz = jnp.sqrt(1.0 - el + 1e-7)
    dirs = (
        el_sqrt * jnp.cos(az) * x[:, None]
        + el_sqrt * jnp.sin(az) * y[:, None]
        + cz * v_nrm[:, None]
    )  # [V, dn, 3]
    bins4, w4 = oct_bilinear_bins_weights(dirs, baked.oct_res)  # [V,dn,4]
    V_, dn = bins4.shape[:2]
    rad = jnp.take_along_axis(
        lvis.astype(jnp.float32), bins4.reshape(V_, dn * 4)[..., None], axis=1
    ).reshape(V_, dn, 4, -1)
    mean = jnp.mean(jnp.sum(rad * w4[..., None], axis=2), axis=1)  # [V, E*3]
    V = mean.shape[0]
    E = mean.shape[-1] // 3
    return jnp.moveaxis(mean.reshape(V, E, 3), 1, 0)  # [E,V,3]
