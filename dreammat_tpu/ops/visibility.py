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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dreammat_tpu.ops import bvh as bvh_lib


class BakedVisibility(NamedTuple):
    table: jnp.ndarray  # [V, O*O] float (1 = unoccluded)
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
) -> BakedVisibility:
    """Cast V x oct_res^2 rays once; vis=1 where the env is visible.
    Rays into the surface (below the tangent plane) never matter for the
    shading estimators (NoL weights them to ~0) so their value is harmless."""
    V = v_pos.shape[0]
    O2 = oct_res * oct_res
    xs = (jnp.arange(oct_res, dtype=jnp.float32) + 0.5) / oct_res
    uu, vv = jnp.meshgrid(xs, xs, indexing="xy")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)  # [O2,2] bin order y*O+x
    dirs = oct_uv_to_dir(uv)  # [O2,3]

    origins = (v_pos + v_nrm * eps)[:, None, :] + dirs[None, :, :] * eps  # [V,O2,3]
    rays_o = origins.reshape(-1, 3)
    rays_d = jnp.broadcast_to(dirs[None], (V, O2, 3)).reshape(-1, 3)
    out = bvh_lib.cast_rays_chunked(bvh, rays_o, rays_d, chunk=chunk)
    vis = (~out["hit"]).astype(jnp.float16).reshape(V, O2)
    return BakedVisibility(table=vis, oct_res=oct_res)


# ---------------------------------------------------------------------------
# lookup
# ---------------------------------------------------------------------------

def lookup_visibility(
    baked: BakedVisibility,
    tri_verts: jnp.ndarray,   # [P,3] vertex indices of each pixel's triangle
    bary: jnp.ndarray,        # [P,3] barycentric weights
    directions: jnp.ndarray,  # [P,S,3]
) -> jnp.ndarray:
    """Soft visibility [P,S]: barycentric mix of the 3 vertex bits at each
    sampled direction's octahedral bin."""
    bins = dir_to_bin(directions, baked.oct_res)  # [P,S]
    t = baked.table.astype(jnp.float32)
    v0 = jnp.take_along_axis(t[tri_verts[:, 0]], bins, axis=-1)  # [P,S]
    v1 = jnp.take_along_axis(t[tri_verts[:, 1]], bins, axis=-1)
    v2 = jnp.take_along_axis(t[tri_verts[:, 2]], bins, axis=-1)
    return bary[:, 0:1] * v0 + bary[:, 1:2] * v1 + bary[:, 2:3] * v2


# ---------------------------------------------------------------------------
# shadowed-radiance cache: env x visibility fused per vertex
# ---------------------------------------------------------------------------

def bake_shadowed_radiance(baked: BakedVisibility, envs: jnp.ndarray) -> jnp.ndarray:
    """L_vis[V, O2, E*3] = env_e(bin_dir) * vis[v, bin]: the fused
    env x visibility cache, laid out with ALL environments in the channel
    axis so one gather per vertex fetches every environment's shadowed
    radiance at once (gather count is independent of env count, and the
    wide row uses the TPU lanes efficiently). float16."""
    from dreammat_tpu.ops import envmap as envmap_lib

    O = baked.oct_res
    xs = (jnp.arange(O, dtype=jnp.float32) + 0.5) / O
    uu, vv = jnp.meshgrid(xs, xs, indexing="xy")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)
    dirs = oct_uv_to_dir(uv)  # [O2,3] in bin order y*O+x
    env_rad = jax.vmap(lambda e: envmap_lib.sample_equirect_bilinear(e, dirs))(envs)
    E = env_rad.shape[0]
    O2 = O * O
    # [E,O2,3] -> [O2, E*3]
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
) -> jnp.ndarray:
    """Soft-shadowed incoming radiance for every environment at once:
    returns [P, S, E, 3]."""
    bins = dir_to_bin(directions, oct_res)  # [P,S]
    t = lvis.astype(jnp.float32)
    C = t.shape[-1]

    def gather_vertex(vidx):
        return jnp.take_along_axis(t[vidx], bins[..., None], axis=1)  # [P,S,E*3]

    out = (
        bary[:, 0:1, None] * gather_vertex(tri_verts[:, 0])
        + bary[:, 1:2, None] * gather_vertex(tri_verts[:, 1])
        + bary[:, 2:3, None] * gather_vertex(tri_verts[:, 2])
    )
    P, S = bins.shape
    return out.reshape(P, S, C // 3, 3)


def lookup_shadowed_radiance(
    lvis: jnp.ndarray,       # [V, O2, E*3] fused cache
    tri_verts: jnp.ndarray,
    bary: jnp.ndarray,
    directions: jnp.ndarray,
    oct_res: int,
    env_id: int = 0,
) -> jnp.ndarray:
    """One environment's shadowed radiance [P,S,3]."""
    all_envs = lookup_shadowed_radiance_all_envs(lvis, tri_verts, bary, directions, oct_res)
    return all_envs[:, :, env_id]


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
    bins = dir_to_bin(dirs, baked.oct_res)  # [V, dn]
    rad = jnp.take_along_axis(lvis.astype(jnp.float32), bins[..., None], axis=1)
    mean = jnp.mean(rad, axis=1)  # [V, E*3]
    V = mean.shape[0]
    E = mean.shape[-1] // 3
    return jnp.moveaxis(mean.reshape(V, E, 3), 1, 0)  # [E,V,3]
