"""Differentiable marching tetrahedra (DMTet) with a fixed face budget.

Device-side, differentiable counterpart of the reference's
``MarchingTetrahedraHelper`` (/root/reference/threestudio_dreammat/
threestudio/models/isosurface.py:23-109, itself the standard
DMTet/kaolin algorithm): surface vertices are linear zero-crossings of
per-lattice-vertex SDF values along tet edges, so gradients flow from
rendered pixels back into the SDF (and optional per-vertex deformation).

TPU-first redesign of the ragged parts:

- the tet lattice is generated procedurally (six tets per cube around the
  main diagonal, same split as ``ops/marching.py``) — no bundled
  ``load/tets/*.npz`` files;
- the reference compacts crossing tets with boolean indexing (dynamic
  shapes). Here a **fixed budget** of tets is selected by ``lax.top_k``
  over the crossing mask (selection indices are inherently
  piecewise-constant, so the stop-gradient through them is exact), and
  every selected tet emits its <=2 triangles into a fixed [F, 3, 3]
  buffer with a validity mask. Downstream consumers (rasterizer, losses)
  mask rather than compact;
- surface-vertex identity (the reference's shared vertex buffer) is
  carried as a global *edge id* per emitted corner — consumers that need
  shared-vertex quantities (vertex normals, consistency losses) segment-
  reduce over sorted edge ids at the same fixed budget.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# six tets per cube around the 0-7 main diagonal (ops/marching.py table)
_CUBE_OFFSETS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=np.int64
)
_TETS = np.array(
    [[0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7],
     [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7]], dtype=np.int64
)

# tet-local edges, indexed 0..5: (corner_a, corner_b)
_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int64)

# 16-case triangle table DERIVED from the verified host-side extractor
# (ops/marching.py _case_tris) — same topology guaranteed; winding is
# fixed per-face at runtime against the sign centroids (like
# marching.py's gradient-based orientation fix), so table order is free.
_EDGE_TO_IDX = {tuple(sorted(e)): i for i, e in enumerate(_EDGES.tolist())}


def _build_tri_table():
    from dreammat_tpu.ops.marching import _case_tris

    table = -np.ones((16, 6), np.int64)
    n_tris = np.zeros(16, np.int64)
    for case in range(16):
        tris = _case_tris(case)
        n_tris[case] = len(tris)
        flat = []
        for tri in tris:
            for (a, b) in tri:
                flat.append(_EDGE_TO_IDX[tuple(sorted((a, b)))])
        table[case, : len(flat)] = flat
    return table, n_tris


_TRI_TABLE, _N_TRIS = _build_tri_table()


class TetLattice(NamedTuple):
    verts: np.ndarray   # [Nv, 3] in [0, 1]
    tets: np.ndarray    # [Nt, 4] int32 vertex ids


def build_tet_lattice(res: int) -> TetLattice:
    """Regular (res+1)^3 grid split into 6 tets/cube (host, once)."""
    n = res + 1
    xs = np.linspace(0.0, 1.0, n, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    verts = grid.reshape(-1, 3)

    def vid(ix, iy, iz):
        return (ix * n + iy) * n + iz

    ix, iy, iz = np.meshgrid(*[np.arange(res)] * 3, indexing="ij")
    base = np.stack([ix, iy, iz], -1).reshape(-1, 1, 3)  # [C,1,3]
    corners = base + _CUBE_OFFSETS[None]                  # [C,8,3]
    cid = vid(corners[..., 0], corners[..., 1], corners[..., 2])  # [C,8]
    tets = cid[:, _TETS].reshape(-1, 4)                   # [C*6,4]
    return TetLattice(verts, tets.astype(np.int32))


class MTOutput(NamedTuple):
    tri_verts: jnp.ndarray   # [F, 3, 3] triangle corner positions
    valid: jnp.ndarray       # [F] bool
    edge_gid: jnp.ndarray    # [F, 3] int32 global edge id per corner


def marching_tets_fixed(
    sdf: jnp.ndarray,        # [Nv] signed values (>0 = inside, kaolin sign)
    verts: jnp.ndarray,      # [Nv, 3] (possibly deformed) lattice positions
    tets: jnp.ndarray,       # [Nt, 4]
    max_tets: int,
) -> MTOutput:
    """Fixed-budget differentiable marching tets. Returns 2*max_tets
    triangle slots; invalid slots are degenerate (all-zero) and masked."""
    Nt = tets.shape[0]
    s4 = sdf[tets]                                   # [Nt,4]
    occ = (s4 > 0).astype(jnp.int32)
    code = occ[:, 0] + 2 * occ[:, 1] + 4 * occ[:, 2] + 8 * occ[:, 3]
    crossing = (code != 0) & (code != 15)

    k = min(max_tets, Nt)
    # top_k over the mask: earliest crossing tets win; which tets cross is
    # piecewise-constant in sdf, so routing through stop_gradient is exact
    score = crossing.astype(jnp.float32)
    _, idx = jax.lax.top_k(score, k)
    idx = jax.lax.stop_gradient(idx)
    sel_valid = crossing[idx]                        # [k]

    t4 = tets[idx]                                   # [k,4]
    sv = sdf[t4]                                     # [k,4] differentiable
    pv = verts[t4]                                   # [k,4,3]
    sel_code = code[idx]                             # [k]

    # surface vertex on each of the 6 tet edges: linear zero crossing
    ea, eb = _EDGES[:, 0], _EDGES[:, 1]
    sa = sv[:, ea]                                   # [k,6]
    sb = sv[:, eb]
    denom = sa - sb
    denom = jnp.where(jnp.abs(denom) < 1e-10, 1e-10, denom)
    t = jnp.clip(sa / denom, 0.0, 1.0)[..., None]    # [k,6,1]
    epos = pv[:, ea] * (1.0 - t) + pv[:, eb] * t     # [k,6,3]

    # global edge ids for vertex identity: sorted global corner pair
    ga = t4[:, ea]
    gb = t4[:, eb]
    lo = jnp.minimum(ga, gb).astype(jnp.int64)
    hi = jnp.maximum(ga, gb).astype(jnp.int64)
    gid6 = (lo * sdf.shape[0] + hi).astype(jnp.int64)  # [k,6]

    tri_edges = jnp.asarray(_TRI_TABLE)[sel_code]    # [k,6]
    n_tris = jnp.asarray(_N_TRIS)[sel_code]          # [k]
    te = jnp.clip(tri_edges.reshape(-1, 2, 3), 0, 5)  # [k,2,3]
    tv = jnp.take_along_axis(
        epos[:, None].repeat(2, axis=1),             # [k,2,6,3]
        te[..., None].repeat(3, axis=-1), axis=2,
    )                                                # [k,2,3,3]
    gid = jnp.take_along_axis(
        gid6[:, None].repeat(2, axis=1), te, axis=2
    )                                                # [k,2,3]
    slot_valid = (
        sel_valid[:, None]
        & (jnp.arange(2)[None, :] < n_tris[:, None])
    )                                                # [k,2]

    # orientation: outward = from the inside (s>0) corner centroid toward
    # the outside centroid; flip triangles whose normal disagrees (the
    # runtime analog of marching.py's gradient-based winding fix)
    w_in = (sv > 0).astype(jnp.float32)[..., None]   # [k,4,1]
    c_in = jnp.sum(pv * w_in, axis=1) / jnp.maximum(jnp.sum(w_in, axis=1), 1e-6)
    c_out = jnp.sum(pv * (1 - w_in), axis=1) / jnp.maximum(
        jnp.sum(1 - w_in, axis=1), 1e-6
    )
    out_dir = (c_out - c_in)[:, None, :]             # [k,1,3]
    n = jnp.cross(tv[..., 1, :] - tv[..., 0, :], tv[..., 2, :] - tv[..., 0, :])
    flip = jnp.sum(n * out_dir, axis=-1) < 0         # [k,2]
    tv = jnp.where(
        flip[..., None, None],
        tv[:, :, jnp.asarray([0, 2, 1])],
        tv,
    )
    gid = jnp.where(flip[..., None], gid[:, :, jnp.asarray([0, 2, 1])], gid)

    tri_verts = jnp.where(
        slot_valid[..., None, None], tv, 0.0
    ).reshape(k * 2, 3, 3)
    valid = slot_valid.reshape(k * 2)
    edge_gid = jnp.where(slot_valid[..., None], gid, -1).reshape(k * 2, 3)
    return MTOutput(tri_verts, valid, edge_gid.astype(jnp.int64))


def face_normals(tri_verts: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """[F,3] unit face normals; zero for invalid slots."""
    e1 = tri_verts[:, 1] - tri_verts[:, 0]
    e2 = tri_verts[:, 2] - tri_verts[:, 0]
    n = jnp.cross(e1, e2)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return jnp.where(valid[:, None], n, 0.0)


def vertex_normals_by_gid(
    tri_verts: jnp.ndarray, valid: jnp.ndarray, edge_gid: jnp.ndarray
) -> jnp.ndarray:
    """Area-weighted shared-vertex normals: segment-sum face normals over
    equal global edge ids (sort + cumsum-diff at fixed shape), gathered
    back per face corner. Returns [F, 3, 3] unit normals."""
    F = tri_verts.shape[0]
    e1 = tri_verts[:, 1] - tri_verts[:, 0]
    e2 = tri_verts[:, 2] - tri_verts[:, 0]
    fn = jnp.cross(e1, e2)  # area-weighted (unnormalized)
    fn = jnp.where(valid[:, None], fn, 0.0)

    gids = edge_gid.reshape(-1)                      # [3F]
    contrib = jnp.repeat(fn, 3, axis=0)              # [3F,3]
    # sort by gid, map runs of equal gids to dense segment ids, segment-sum
    # face contributions, gather the run total back per element
    order = jnp.argsort(gids)
    sg = gids[order]
    sc = contrib[order]
    new_run = jnp.concatenate(
        [jnp.asarray([True]), sg[1:] != sg[:-1]]
    )
    seg_id = jnp.cumsum(new_run) - 1                 # [3F] dense
    totals = jax.ops.segment_sum(sc, seg_id, num_segments=gids.shape[0])
    per_elem = totals[seg_id]                        # [3F,3] sorted order
    inv = jnp.argsort(order)
    vn = per_elem[inv].reshape(F, 3, 3)
    vn = vn * jax.lax.rsqrt(jnp.sum(vn * vn, axis=-1, keepdims=True) + 1e-12)
    return jnp.where(valid[:, None, None], vn, 0.0)


def laplacian_smoothness(
    tri_verts: jnp.ndarray, valid: jnp.ndarray, edge_gid: jnp.ndarray
) -> jnp.ndarray:
    """Uniform-Laplacian smoothness over the fixed-budget soup: mean
    ||mean(neighbors) - v|| per unique surface vertex.

    Matches the reference's ``Mesh.laplacian`` (threestudio/models/mesh.py:
    278-311, L = D - A uniform weights) up to the per-vertex degree
    normalization: on a closed marching-tets surface every edge is shared
    by exactly 2 faces, so the soup's duplicated neighbor contributions
    cancel in the mean and the two losses apply the same smoothing
    pressure. Gradients flow through every vertex-position appearance,
    exactly as L.mm(v_pos) does with constant L."""
    F = tri_verts.shape[0]
    gids = edge_gid.reshape(-1)                      # [3F]
    # each corner's two in-face neighbors, summed -> one [3F,3] contribution
    nbr = (
        tri_verts[:, jnp.asarray([1, 2, 0])]
        + tri_verts[:, jnp.asarray([2, 0, 1])]
    ).reshape(-1, 3)
    vmask = jnp.repeat(valid, 3).astype(jnp.float32)
    order = jnp.argsort(gids)
    sg = gids[order]
    new_run = jnp.concatenate([jnp.asarray([True]), sg[1:] != sg[:-1]])
    seg_id = jnp.cumsum(new_run) - 1                 # [3F] dense per-gid
    n_seg = gids.shape[0]
    nbr_sum = jax.ops.segment_sum(
        nbr[order] * vmask[order, None], seg_id, num_segments=n_seg
    )
    cnt = jax.ops.segment_sum(
        2.0 * vmask[order], seg_id, num_segments=n_seg
    )
    pos_sum = jax.ops.segment_sum(
        tri_verts.reshape(-1, 3)[order] * vmask[order, None],
        seg_id, num_segments=n_seg,
    )
    occ = jax.ops.segment_sum(vmask[order], seg_id, num_segments=n_seg)
    # representative position per unique vertex (all corners sharing a gid
    # interpolate the same lattice edge -> identical position)
    v = pos_sum / jnp.maximum(occ, 1.0)[:, None]
    lap = nbr_sum / jnp.maximum(cnt, 1.0)[:, None] - v
    # only segments that belong to valid faces (gid >= 0) count
    seg_valid = (
        (jax.ops.segment_max(vmask[order], seg_id, num_segments=n_seg) > 0)
        & (jax.ops.segment_min(sg, num_segments=n_seg,
                               segment_ids=seg_id) >= 0)
    )
    norm = jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-12)
    return jnp.sum(jnp.where(seg_valid, norm, 0.0)) / jnp.maximum(
        jnp.sum(seg_valid), 1
    )


def normal_consistency(
    tri_verts: jnp.ndarray, valid: jnp.ndarray, edge_gid: jnp.ndarray
) -> jnp.ndarray:
    """Smoothness: mean (1 - cos) between each face's normal and its
    shared-vertex normals. Same pressure as the reference's edge-based
    ``Mesh.normal_consistency`` (mesh.py) expressed over the fixed-budget
    soup (documented substitution — adjacency lists are ragged)."""
    fn = face_normals(tri_verts, valid)
    vn = vertex_normals_by_gid(tri_verts, valid, edge_gid)
    cos = jnp.sum(fn[:, None, :] * vn, axis=-1)      # [F,3]
    pen = jnp.where(valid[:, None], 1.0 - cos, 0.0)
    return jnp.sum(pen) / jnp.maximum(jnp.sum(valid) * 3, 1)
