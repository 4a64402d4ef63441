"""Sketch-shape guidance for Latent-NeRF: CE between the NeRF occupancy
and a guide mesh's interior indicator, down-weighted near the surface.

TPU-native rebuild of the reference ``ShapeLoss`` stack
(/root/reference/threestudio_dreammat/threestudio/utils/ops.py:316-421),
which calls libigl's ``fast_winding_number_for_meshes`` and
``point_mesh_squared_distance`` on the CPU for every batch of ray
samples. Here both fields are precomputed ONCE at configure time onto a
dense voxel grid (exact generalized winding number + exact point-triangle
distance, chunked ``lax.map`` over grid points), and the per-step loss
trilinearly samples the grid in-trace — O(P) memory-bound work per step
instead of a host round-trip + O(P*T) scan, and no igl dependency.

Parity notes:
- winding number: van Oosterom–Strackee signed solid angle summed over
  triangles — the exact quantity igl's fast (approximate, octree) version
  estimates.
- the guide mesh is normalized and axis-rotated exactly like the
  reference (``ShapeLoss.__init__``: mesh_scale=0.7, the fixed
  ``matrix_rot`` product).
- ``ce_pq_loss`` reproduces utils/ops.py:375-384 (clamp T=1e-4, weighted
  SUM, not mean).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# combined fixed rotation from the reference ShapeLoss.__init__
# (utils/ops.py:395-397): Rx(90deg-ish) @ Ry — applied to the normalized
# guide verts
_MATRIX_ROT = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32) @ \
    np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)


def winding_number(points: jnp.ndarray, tri_verts: jnp.ndarray,
                   chunk: int = 4096) -> jnp.ndarray:
    """Generalized winding number of ``points`` [P,3] w.r.t. the triangle
    soup ``tri_verts`` [T,3,3] (van Oosterom–Strackee solid angles).
    ~0 outside a closed mesh, ~1 inside."""
    P = points.shape[0]
    pad = (-P) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, chunk, 3)

    def one_chunk(p):
        a = tri_verts[None, :, 0] - p[:, None]        # [C,T,3]
        b = tri_verts[None, :, 1] - p[:, None]
        c = tri_verts[None, :, 2] - p[:, None]
        la = jnp.linalg.norm(a, axis=-1)
        lb = jnp.linalg.norm(b, axis=-1)
        lc = jnp.linalg.norm(c, axis=-1)
        num = jnp.sum(a * jnp.cross(b, c), axis=-1)
        den = (
            la * lb * lc
            + jnp.sum(a * b, axis=-1) * lc
            + jnp.sum(b * c, axis=-1) * la
            + jnp.sum(c * a, axis=-1) * lb
        )
        omega = 2.0 * jnp.arctan2(num, den)
        return jnp.sum(omega, axis=-1) / (4.0 * jnp.pi)

    w = jax.lax.map(one_chunk, pts).reshape(-1)
    return w[:P]


def point_mesh_sq_distance(points: jnp.ndarray, tri_verts: jnp.ndarray,
                           chunk: int = 4096) -> jnp.ndarray:
    """Exact squared distance from each point [P,3] to the closest
    triangle of [T,3,3] (Ericson's barycentric-clamp point-triangle
    test, vectorized over the P x T product, chunked over points)."""
    P = points.shape[0]
    pad = (-P) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    va, vb, vc = tri_verts[:, 0], tri_verts[:, 1], tri_verts[:, 2]
    ab = vb - va
    ac = vc - va

    def one_chunk(p):
        ap = p[:, None] - va[None]                    # [C,T,3]
        d1 = jnp.sum(ab[None] * ap, axis=-1)
        d2 = jnp.sum(ac[None] * ap, axis=-1)
        bp = p[:, None] - vb[None]
        d3 = jnp.sum(ab[None] * bp, axis=-1)
        d4 = jnp.sum(ac[None] * bp, axis=-1)
        cp = p[:, None] - vc[None]
        d5 = jnp.sum(ab[None] * cp, axis=-1)
        d6 = jnp.sum(ac[None] * cp, axis=-1)

        va_ = d3 * d6 - d5 * d4
        vb_ = d5 * d2 - d1 * d6
        vc_ = d1 * d4 - d3 * d2
        denom = jnp.maximum(va_ + vb_ + vc_, 1e-30)
        v = vb_ / denom
        w = vc_ / denom
        # interior candidate
        v = jnp.clip(v, 0.0, 1.0)
        w = jnp.clip(w, 0.0, 1.0 - v)
        # vertex/edge regions (Ericson 5.1.5 case analysis)
        v = jnp.where((d1 <= 0) & (d2 <= 0), 0.0, v)
        w = jnp.where((d1 <= 0) & (d2 <= 0), 0.0, w)
        v = jnp.where((d3 >= 0) & (d4 <= d3), 1.0, v)
        w = jnp.where((d3 >= 0) & (d4 <= d3), 0.0, w)
        v = jnp.where((d6 >= 0) & (d5 <= d6), 0.0, v)
        w = jnp.where((d6 >= 0) & (d5 <= d6), 1.0, w)
        e_ab = (vc_ <= 0) & (d1 >= 0) & (d3 <= 0)
        t_ab = jnp.where(jnp.abs(d1 - d3) > 1e-30, d1 / (d1 - d3 + 1e-30), 0.0)
        v = jnp.where(e_ab, jnp.clip(t_ab, 0.0, 1.0), v)
        w = jnp.where(e_ab, 0.0, w)
        e_ac = (vb_ <= 0) & (d2 >= 0) & (d6 <= 0)
        t_ac = jnp.where(jnp.abs(d2 - d6) > 1e-30, d2 / (d2 - d6 + 1e-30), 0.0)
        v = jnp.where(e_ac, 0.0, v)
        w = jnp.where(e_ac, jnp.clip(t_ac, 0.0, 1.0), w)
        e_bc = (va_ <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
        t_bc = (d4 - d3) / (jnp.abs(d4 - d3 + d5 - d6) + 1e-30)
        t_bc = jnp.clip(t_bc, 0.0, 1.0)
        v = jnp.where(e_bc, 1.0 - t_bc, v)
        w = jnp.where(e_bc, t_bc, w)

        closest = va[None] + v[..., None] * ab[None] + w[..., None] * ac[None]
        d2_all = jnp.sum((p[:, None] - closest) ** 2, axis=-1)   # [C,T]
        return jnp.min(d2_all, axis=-1)

    d = jax.lax.map(one_chunk, pts).reshape(-1)
    return d[:P]


def mesh_signed_distance(
    points: jnp.ndarray,     # [P,3]
    tri_verts: jnp.ndarray,  # [T,3,3]
    inside_positive: bool = True,
    chunk: int = 4096,
) -> jnp.ndarray:
    """Exact signed distance to a closed triangle mesh: magnitude from the
    point-triangle distance, sign from the generalized winding number.
    The JAX replacement for the reference's pysdf oracle
    (implicit_sdf.py:185-194, tetrahedra_sdf_grid shape_init) — pysdf is
    inside-positive; pass ``inside_positive=False`` for the implicit-sdf
    convention (its sphere target is |p| - r, negative inside)."""
    d = jnp.sqrt(point_mesh_sq_distance(points, tri_verts, chunk=chunk))
    w = winding_number(points, tri_verts, chunk=chunk)
    sign = jnp.where(w > 0.5, 1.0, -1.0)
    if not inside_positive:
        sign = -sign
    return sign * d


class ShapeGrid(NamedTuple):
    winding: jnp.ndarray   # [G,G,G] generalized winding number
    weight: jnp.ndarray    # [G,G,G] CE weight = 1 - gaussian(dist)
    bound: float           # grid spans [-bound, bound]^3


def build_shape_grid(
    verts: np.ndarray,      # [V,3] guide mesh vertices (raw OBJ space)
    faces: np.ndarray,      # [F,3] int
    resolution: int = 64,
    mesh_scale: float = 0.7,
    proximal_surface: float = 0.3,
    bound: float = 1.0,
) -> ShapeGrid:
    """One-time bake of the reference's two igl fields onto a voxel grid.
    Normalization + rotation follow ShapeLoss.__init__ (utils/ops.py:
    387-404): center at the vertex mean, scale the max radius to
    ``mesh_scale``, then apply the fixed axis rotation."""
    v = np.asarray(verts, np.float32)
    v = v - v.mean(axis=0)
    scale = float(np.max(np.linalg.norm(v, axis=1)))
    v = v / max(scale, 1e-12) * mesh_scale
    v = v @ _MATRIX_ROT.T
    tri = jnp.asarray(v[np.asarray(faces, np.int64)])  # [T,3,3]

    g = np.linspace(-bound, bound, resolution, dtype=np.float32)
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))

    wind = winding_number(pts, tri).reshape(resolution, resolution, resolution)
    if proximal_surface > 0:
        d2 = point_mesh_sq_distance(pts, tri)
        gauss = jnp.exp(-d2 / (2.0 * proximal_surface ** 2))
        weight = (1.0 - gauss).reshape(resolution, resolution, resolution)
    else:
        weight = jnp.ones((resolution,) * 3, jnp.float32)
    return ShapeGrid(wind, weight, float(bound))


def _trilinear(grid: jnp.ndarray, pts: jnp.ndarray, bound: float) -> jnp.ndarray:
    """Sample [G,G,G] at [...,3] points in [-bound,bound]^3 (edge clamp)."""
    G = grid.shape[0]
    u = (pts / (2.0 * bound) + 0.5) * (G - 1)
    u = jnp.clip(u, 0.0, G - 1 - 1e-6)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    i1 = jnp.minimum(i0 + 1, G - 1)

    def at(ix, iy, iz):
        return grid[ix, iy, iz]

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = at(x0, y0, z0) * (1 - fx) + at(x1, y0, z0) * fx
    c10 = at(x0, y1, z0) * (1 - fx) + at(x1, y1, z0) * fx
    c01 = at(x0, y0, z1) * (1 - fx) + at(x1, y0, z1) * fx
    c11 = at(x0, y1, z1) * (1 - fx) + at(x1, y1, z1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def shape_loss(
    points: jnp.ndarray,    # [...,3] ray sample positions
    density: jnp.ndarray,   # [...] or [...,1] sigma at the samples
    grid: ShapeGrid,
    delta: float = 0.2,
) -> jnp.ndarray:
    """ShapeLoss.forward (utils/ops.py:406-421): weighted CE pushing the
    NeRF occupancy toward the guide mesh's inside/outside indicator, with
    the near-surface band down-weighted."""
    if density.ndim == points.ndim:      # trailing singleton channel
        density = density[..., 0]
    occ = _trilinear(grid.winding, points, grid.bound)
    indicator = (occ > 0.5).astype(jnp.float32)
    weight = _trilinear(grid.weight, points, grid.bound)
    nerf_occ = jnp.clip(1.0 - jnp.exp(-delta * density), 0.0, 1.1)
    q = jnp.clip(indicator, 1e-4, 1.0 - 1e-4)
    ce = -(nerf_occ * jnp.log(q) + (1.0 - nerf_occ) * jnp.log(1.0 - q))
    return jnp.sum(ce * weight)
