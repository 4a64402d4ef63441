"""Skip-link BVH: host-side build, stackless vectorized device traversal.

TPU-native replacement for the reference's CUDA ``_raytracing`` BVH
(/root/reference/threestudio_dreammat/threestudio/models/renderers/
raytracing_renderer.py:18-67). Design:

- the BVH is built ONCE per mesh on the host (binned median split) and
  flattened in DFS order with *skip links*: for node ``i`` the hit-link is
  implicitly ``i+1`` (its first child) and ``miss[i]`` jumps past its
  subtree. Traversal is then a single ``while`` loop with one live register
  (the current node index) per ray — no per-ray stacks, no scatter — which
  vectorizes cleanly over thousands of rays on the VPU.
- leaves hold up to ``LEAF_SIZE`` triangles stored contiguously (SoA:
  v0 / e1 / e2), tested with a masked Möller–Trumbore batch.

Miss semantics match the reference (raytracing_renderer.py:318-324):
``depth >= 10`` means miss; hit positions/normals are only valid for hits.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 4
MISS_DEPTH = 10.0


class FlatBVH(NamedTuple):
    """Device-side flat BVH (all arrays static-shaped).

    ``node_packed``/``tri_packed`` duplicate the SoA fields into single wide
    rows so the traversal loop issues ONE gather per node / leaf-triangle
    instead of five — random small gathers are the latency bottleneck of the
    while_loop on TPU."""

    node_min: jnp.ndarray   # [N,3] f32
    node_max: jnp.ndarray   # [N,3] f32
    node_miss: jnp.ndarray  # [N] i32, node index after this subtree (-1 = done)
    node_first: jnp.ndarray  # [N] i32, first tri slot for leaves (0 for internal)
    node_count: jnp.ndarray  # [N] i32, tri count for leaves (0 = internal)
    tri_v0: jnp.ndarray     # [T,3] f32 (T = padded reordered tris)
    tri_e1: jnp.ndarray     # [T,3]
    tri_e2: jnp.ndarray     # [T,3]
    tri_id: jnp.ndarray     # [T] i32 original face index (-1 = padding)
    node_packed: jnp.ndarray  # [N,9] f32: min3 | max3 | miss | first | count
    tri_packed: jnp.ndarray   # [T,10] f32: v0 | e1 | e2 | id


_NATIVE_LIB = None
_NATIVE_TRIED = False


def _load_native():
    """Load (building if needed) the C++ builder in native/bvh_builder.cpp.
    Falls back silently to the numpy builder."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    import ctypes
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lib_path = os.path.join(root, "native", "lib", "libbvh_builder.so")
    if not os.path.exists(lib_path):
        src = os.path.join(root, "native", "bvh_builder.cpp")
        if os.path.exists(src):
            try:
                os.makedirs(os.path.dirname(lib_path), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", lib_path],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
    if not os.path.exists(lib_path):
        return None
    try:
        lib = ctypes.CDLL(lib_path)
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bvh_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        _NATIVE_LIB = lib
    except OSError:
        _NATIVE_LIB = None
    return _NATIVE_LIB


def _build_bvh_native(vertices: np.ndarray, faces: np.ndarray):
    """C++ fast path; returns the flat arrays or None if unavailable."""
    import ctypes

    lib = _load_native()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    n_nodes = ctypes.c_int64()
    n_tris = ctypes.c_int64()
    handle = lib.bvh_build(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), f.shape[0],
        ctypes.byref(n_nodes), ctypes.byref(n_tris),
    )
    N, T = n_nodes.value, n_tris.value
    node_min = np.empty((N, 3), np.float32)
    node_max = np.empty((N, 3), np.float32)
    node_miss = np.empty(N, np.int32)
    node_first = np.empty(N, np.int32)
    node_count = np.empty(N, np.int32)
    out_tris = np.empty(T, np.int64)
    lib.bvh_read(
        handle,
        node_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_miss.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        node_first.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        node_count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return node_min, node_max, node_miss, node_first, node_count, out_tris


def _pack(node_min, node_max, node_miss, node_first, node_count, tv0, te1, te2, tid):
    node_packed = np.concatenate(
        [node_min, node_max,
         node_miss[:, None].astype(np.float32),
         node_first[:, None].astype(np.float32),
         node_count[:, None].astype(np.float32)], axis=1
    ).astype(np.float32)
    tri_packed = np.concatenate(
        [tv0, te1, te2, tid[:, None].astype(np.float32)], axis=1
    ).astype(np.float32)
    return node_packed, tri_packed


def build_bvh(vertices: np.ndarray, faces: np.ndarray, use_native: bool = True) -> FlatBVH:
    """Host-side BVH build (median split on the largest centroid axis).
    Uses the C++ builder (native/bvh_builder.cpp) when available; the numpy
    path below is the reference implementation and fallback."""
    if use_native:
        native = _build_bvh_native(vertices, faces)
        if native is not None:
            node_min, node_max, node_miss, node_first, node_count, out = native
            vertices = np.asarray(vertices, dtype=np.float32)
            faces = np.asarray(faces, dtype=np.int64)
            v0 = vertices[faces[:, 0]]
            v1 = vertices[faces[:, 1]]
            v2 = vertices[faces[:, 2]]
            T = int(np.ceil(max(len(out), 1) / LEAF_SIZE) * LEAF_SIZE)
            pad = T - len(out)
            tv0 = np.concatenate([v0[out], np.zeros((pad, 3), np.float32)])
            te1 = np.concatenate([(v1 - v0)[out], np.zeros((pad, 3), np.float32)])
            te2 = np.concatenate([(v2 - v0)[out], np.zeros((pad, 3), np.float32)])
            tid = np.concatenate([out.astype(np.int32), -np.ones(pad, np.int32)])
            npk, tpk = _pack(node_min, node_max, node_miss, node_first, node_count,
                             tv0.astype(np.float32), te1.astype(np.float32),
                             te2.astype(np.float32), tid)
            return FlatBVH(
                node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max),
                node_miss=jnp.asarray(node_miss), node_first=jnp.asarray(node_first),
                node_count=jnp.asarray(node_count),
                tri_v0=jnp.asarray(tv0), tri_e1=jnp.asarray(te1),
                tri_e2=jnp.asarray(te2), tri_id=jnp.asarray(tid),
                node_packed=jnp.asarray(npk), tri_packed=jnp.asarray(tpk),
            )
    return _build_bvh_python(vertices, faces)


def _build_bvh_python(vertices: np.ndarray, faces: np.ndarray) -> FlatBVH:
    """Numpy reference builder (also the fallback when g++ is unavailable)."""
    vertices = np.asarray(vertices, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int64)
    F = faces.shape[0]
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    centroids = (tri_min + tri_max) * 0.5

    # iterative build producing a DFS-ordered node list
    nodes = []  # (min, max, first_or_child, count, parent_slot_for_miss)

    order = np.arange(F)
    out_tris: list = []

    def emit(tri_idx: np.ndarray) -> int:
        """Append nodes for this set; return index of the created node."""
        my = len(nodes)
        bmin = tri_min[tri_idx].min(axis=0)
        bmax = tri_max[tri_idx].max(axis=0)
        if len(tri_idx) <= LEAF_SIZE:
            first = len(out_tris)
            out_tris.extend(tri_idx.tolist())
            nodes.append([bmin, bmax, first, len(tri_idx), -1])
            return my
        nodes.append([bmin, bmax, 0, 0, -1])
        c = centroids[tri_idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        med = np.median(c[:, axis])
        left_mask = c[:, axis] <= med
        if left_mask.all() or not left_mask.any():
            half = len(tri_idx) // 2
            ordering = np.argsort(c[:, axis], kind="stable")
            left_idx, right_idx = tri_idx[ordering[:half]], tri_idx[ordering[half:]]
        else:
            left_idx, right_idx = tri_idx[left_mask], tri_idx[~left_mask]
        emit(left_idx)
        emit(right_idx)
        return my

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000 + 2 * F))
    try:
        emit(order)
    finally:
        sys.setrecursionlimit(old_limit)

    N = len(nodes)
    node_min = np.stack([n[0] for n in nodes])
    node_max = np.stack([n[1] for n in nodes])
    node_first = np.array([n[2] for n in nodes], dtype=np.int32)
    node_count = np.array([n[3] for n in nodes], dtype=np.int32)

    # miss links: for DFS order, miss[i] = index just past i's subtree.
    # compute subtree extents by simulating the DFS with an explicit stack.
    subtree_end = np.zeros(N, dtype=np.int32)

    def compute_end(i: int) -> int:
        if node_count[i] > 0:
            subtree_end[i] = i + 1
            return i + 1
        l_end = compute_end(i + 1)
        r_end = compute_end(l_end)
        subtree_end[i] = r_end
        return r_end

    sys.setrecursionlimit(max(old_limit, 10000 + 2 * N))
    try:
        compute_end(0)
    finally:
        sys.setrecursionlimit(old_limit)
    node_miss = np.where(subtree_end >= N, -1, subtree_end).astype(np.int32)

    # reordered triangle SoA, padded to a multiple of LEAF_SIZE
    out = np.asarray(out_tris, dtype=np.int64)
    T = int(np.ceil(max(len(out), 1) / LEAF_SIZE) * LEAF_SIZE)
    pad = T - len(out)
    tv0 = np.concatenate([v0[out], np.zeros((pad, 3), np.float32)])
    te1 = np.concatenate([(v1 - v0)[out], np.zeros((pad, 3), np.float32)])
    te2 = np.concatenate([(v2 - v0)[out], np.zeros((pad, 3), np.float32)])
    tid = np.concatenate([out.astype(np.int32), -np.ones(pad, np.int32)])

    npk, tpk = _pack(node_min, node_max, node_miss.astype(np.int32),
                     node_first, node_count,
                     tv0.astype(np.float32), te1.astype(np.float32),
                     te2.astype(np.float32), tid.astype(np.int32))
    return FlatBVH(
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        node_miss=jnp.asarray(node_miss),
        node_first=jnp.asarray(node_first),
        node_count=jnp.asarray(node_count),
        tri_v0=jnp.asarray(tv0),
        tri_e1=jnp.asarray(te1),
        tri_e2=jnp.asarray(te2),
        tri_id=jnp.asarray(tid),
        node_packed=jnp.asarray(npk),
        tri_packed=jnp.asarray(tpk),
    )


# ---------------------------------------------------------------------------
# device traversal
# ---------------------------------------------------------------------------

def _ray_aabb(o, inv_d, bmin, bmax, t_best):
    """Slab test; returns bool hit given current best t."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    return (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_best)


def _tri_hits(o, d, v0, e1, e2, eps=1e-9):
    """Möller–Trumbore for a [R, L] batch of triangles per ray.
    o,d: [R,3]; v0,e1,e2: [R,L,3]. Returns (t, u, v, valid)."""
    d_ = d[:, None, :]
    o_ = o[:, None, :]
    pvec = jnp.cross(d_, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tvec = o_ - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d_ * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > eps)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > 1e-6)
    )
    return t, u, v, valid


@functools.partial(jax.jit, static_argnames=("max_iters",))
def cast_rays(
    bvh: FlatBVH,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_max: float = MISS_DEPTH,
    max_iters: int = 20000,
):
    """First-hit ray cast. Returns dict with t [R], face [R] (-1 miss),
    bary u,v [R], hit [R] bool. Fully vectorized over rays; terminates when
    every ray has walked off the tree."""
    R = rays_o.shape[0]
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)

    cur = jnp.zeros((R,), dtype=jnp.int32)
    t_best = jnp.full((R,), t_max, dtype=jnp.float32)
    face_best = jnp.full((R,), -1, dtype=jnp.int32)
    u_best = jnp.zeros((R,), dtype=jnp.float32)
    v_best = jnp.zeros((R,), dtype=jnp.float32)

    def cond(state):
        cur, *_ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, t_best, face_best, u_best, v_best, it = state
        safe = jnp.maximum(cur, 0)
        # ONE wide gather per node (min|max|miss|first|count packed rows):
        # separate small gathers are the latency bottleneck of this loop
        node = bvh.node_packed[safe]  # [R,9]
        bmin = node[:, 0:3]
        bmax = node[:, 3:6]
        miss_link = node[:, 6].astype(jnp.int32)
        first = node[:, 7].astype(jnp.int32)
        count = node[:, 8].astype(jnp.int32)
        active = cur >= 0

        aabb_hit = _ray_aabb(o, inv_d, bmin, bmax, t_best) & active
        is_leaf = (count > 0) & aabb_hit

        # masked leaf triangle tests (LEAF_SIZE fixed), one gather per slot row
        slots = first[:, None] + jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]
        lane_ok = jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :] < count[:, None]
        slots = jnp.where(lane_ok & is_leaf[:, None], slots, 0)
        tri = bvh.tri_packed[slots]  # [R,L,10]
        tv0 = tri[..., 0:3]
        te1 = tri[..., 3:6]
        te2 = tri[..., 6:9]
        tid = tri[..., 9].astype(jnp.int32)
        t, u, v, valid = _tri_hits(o, d, tv0, te1, te2)
        valid = valid & lane_ok & is_leaf[:, None] & (t < t_best[:, None])
        t_masked = jnp.where(valid, t, jnp.inf)
        lane = jnp.argmin(t_masked, axis=-1)
        t_lane = jnp.take_along_axis(t_masked, lane[:, None], axis=-1)[:, 0]
        improved = jnp.isfinite(t_lane)
        sel = lambda arr: jnp.take_along_axis(arr, lane[:, None], axis=-1)[:, 0]
        t_best = jnp.where(improved, t_lane, t_best)
        face_best = jnp.where(improved, sel(tid), face_best)
        u_best = jnp.where(improved, sel(u), u_best)
        v_best = jnp.where(improved, sel(v), v_best)

        descend = aabb_hit & (count == 0)
        nxt = jnp.where(descend, cur + 1, miss_link)
        nxt = jnp.where(active, nxt, -1)
        return nxt, t_best, face_best, u_best, v_best, it + 1

    cur, t_best, face_best, u_best, v_best, _ = jax.lax.while_loop(
        cond, body, (cur, t_best, face_best, u_best, v_best, jnp.int32(0))
    )
    hit = face_best >= 0
    return {
        "t": jnp.where(hit, t_best, MISS_DEPTH),
        "face": face_best,
        "u": u_best,
        "v": v_best,
        "hit": hit,
    }


# Below this many triangles, dense scanning wins on TPU: the BVH while_loop
# is gather-latency-bound, the dense paths are regular vector math. Measured
# on one v5e chip, 262144 rays (tools/bench_casters.py, icospheres):
#
#   tris    pallas-dense  xla-plane  mt-dense   bvh-while-loop
#   1.3k        17 ms        43 ms     155 ms      1.40 s
#   20k        143 ms       566 ms    2.07 s       2.50 s
#   327k       2.18 s       9.20 s       —        19.5 s
#   1.31M      8.71 s      36.6 s        —        53.2 s
#
# The Pallas tiled caster (VMEM running-min, MXU dot products) beats the
# while-loop traversal at EVERY size tested — 6x even at 1.3M tris — so the
# threshold only guards degenerate inputs where the [12, T] row tile and
# (R/bR x T/bT) grid stop making sense.
DENSE_CAST_MAX_TRIS = 1 << 22


@functools.partial(jax.jit, static_argnames=("tri_chunk",))
def cast_rays_dense(bvh: FlatBVH, rays_o, rays_d, t_max: float = MISS_DEPTH,
                    tri_chunk: int = 128):
    """First-hit cast by scanning ALL triangles in fixed chunks (lax.scan,
    running min-t reduction). No gathers, no divergence — TPU-shaped."""
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    R = o.shape[0]
    T = bvh.tri_packed.shape[0]
    padT = (-T) % tri_chunk
    tp = bvh.tri_packed
    if padT:
        pad_rows = jnp.zeros((padT, tp.shape[1]), tp.dtype).at[:, 9].set(-1.0)
        tp = jnp.concatenate([tp, pad_rows])
    chunks = tp.reshape(-1, tri_chunk, tp.shape[1])

    def body(carry, tri):
        t_best, face_best, u_best, v_best = carry
        tv0 = jnp.broadcast_to(tri[None, :, 0:3], (R, tri_chunk, 3))
        te1 = jnp.broadcast_to(tri[None, :, 3:6], (R, tri_chunk, 3))
        te2 = jnp.broadcast_to(tri[None, :, 6:9], (R, tri_chunk, 3))
        tid = tri[:, 9].astype(jnp.int32)
        t, u, v, valid = _tri_hits(o, d, tv0, te1, te2)
        valid = valid & (tid >= 0)[None, :] & (t < t_best[:, None])
        t_masked = jnp.where(valid, t, jnp.inf)
        lane = jnp.argmin(t_masked, axis=-1)
        t_lane = jnp.take_along_axis(t_masked, lane[:, None], axis=-1)[:, 0]
        improved = jnp.isfinite(t_lane)
        sel = lambda arr: jnp.take_along_axis(arr, lane[:, None], axis=-1)[:, 0]
        return (
            jnp.where(improved, t_lane, t_best),
            jnp.where(improved, tid[lane], face_best),
            jnp.where(improved, sel(u), u_best),
            jnp.where(improved, sel(v), v_best),
        ), None

    init = (
        jnp.full((R,), t_max, jnp.float32),
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
    )
    (t_best, face_best, u_best, v_best), _ = jax.lax.scan(body, init, chunks)
    hit = face_best >= 0
    return {
        "t": jnp.where(hit, t_best, MISS_DEPTH),
        "face": face_best,
        "u": u_best,
        "v": v_best,
        "hit": hit,
    }


@jax.jit
def cast_rays_plane(bvh: FlatBVH, rays_o, rays_d, t_max: float = MISS_DEPTH):
    """First-hit cast via per-triangle PLANE/EDGE equations instead of
    per-pair Möller–Trumbore.

    The MT dense scan (cast_rays_dense) materializes ~20 [rays, tris, 3]
    temporaries per chunk (cross products, tvec/qvec) — HBM-bandwidth bound
    at ~2.8 s per 512² view on 23k tris. Here everything pairwise is six
    [R,3]x[3,T] matmuls (MXU) plus ~12 fused elementwise ops on [R,T]:

        t(r,T)  = -(o.N + d0) / (d.N)
        u(r,T)  = (o.g_u + cu) + t * (d.g_u)      (affine in the hit point)
        v(r,T)  = (o.g_v + cv) + t * (d.g_v)

    with per-triangle constants N = e1 x e2, g_u = (e2 x N)/<e2 x N, e1>,
    g_v = (N x e1)/<N x e1, e2> computed once per dispatch. Barycentric
    u,v match the MT convention (p = v0 + u e1 + v e2)."""
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    R = o.shape[0]
    T = bvh.tri_v0.shape[0]

    v0, e1, e2 = bvh.tri_v0, bvh.tri_e1, bvh.tri_e2
    n = jnp.cross(e1, e2)                                    # [T,3]
    gu_raw = jnp.cross(e2, n)
    gv_raw = jnp.cross(n, e1)
    du = jnp.sum(gu_raw * e1, axis=-1, keepdims=True)
    dv = jnp.sum(gv_raw * e2, axis=-1, keepdims=True)
    degen = (jnp.abs(du) < 1e-18) | (jnp.abs(dv) < 1e-18)
    gu = gu_raw / jnp.where(jnp.abs(du) < 1e-18, 1.0, du)
    gv = gv_raw / jnp.where(jnp.abs(dv) < 1e-18, 1.0, dv)
    d0 = -jnp.sum(n * v0, axis=-1)                           # [T]
    cu = -jnp.sum(gu * v0, axis=-1)
    cv = -jnp.sum(gv * v0, axis=-1)
    tid = jnp.where(degen[:, 0], -1, bvh.tri_id)
    # [3, T] right-hand sides for the six ray matmuls
    mats = jnp.stack([n.T, gu.T, gv.T])                      # [3,3,T]

    # ray-chunk size: keep [rc, T] f32 intermediates ~64 MB
    rc = max(128, min(4096, ((1 << 24) // max(T, 1)) // 128 * 128))
    pad = (-R) % rc
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    oc = o.reshape(-1, rc, 3)
    dc = d.reshape(-1, rc, 3)

    def body(_, od):
        o_, d_ = od
        hi = jax.lax.Precision.HIGHEST
        po = jnp.einsum("rk,mkt->mrt", o_, mats, precision=hi)  # [3,rc,T]
        pd = jnp.einsum("rk,mkt->mrt", d_, mats, precision=hi)
        B = pd[0]
        safe = jnp.abs(B) > 1e-12
        t = -(po[0] + d0[None, :]) / jnp.where(safe, B, 1.0)
        u = (po[1] + cu[None, :]) + t * pd[1]
        v = (po[2] + cv[None, :]) + t * pd[2]
        valid = (
            safe & (t > 1e-6) & (t < t_max)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (tid >= 0)[None, :]
        )
        t_masked = jnp.where(valid, t, jnp.inf)
        lane = jnp.argmin(t_masked, axis=-1)
        tl = jnp.take_along_axis(t_masked, lane[:, None], axis=-1)[:, 0]
        hit = jnp.isfinite(tl)
        sel = lambda a: jnp.take_along_axis(a, lane[:, None], axis=-1)[:, 0]
        return None, {
            "t": jnp.where(hit, tl, MISS_DEPTH),
            "face": jnp.where(hit, tid[lane], -1),
            "u": jnp.where(hit, sel(u), 0.0),
            "v": jnp.where(hit, sel(v), 0.0),
            "hit": hit,
        }

    _, out = jax.lax.scan(body, None, (oc, dc))
    return jax.tree_util.tree_map(lambda x: x.reshape(-1, *x.shape[2:])[:R], out)


def _plane_tri_data(bvh: FlatBVH):
    """Per-triangle plane/edge-equation constants (see cast_rays_plane):
    rows [Nx Ny Nz d0 | gux guy guz cu | gvx gvy gvz cv] as [12, T], plus
    tri ids as f32 (exact for id < 2^24; the dense casters never see more)."""
    v0, e1, e2 = bvh.tri_v0, bvh.tri_e1, bvh.tri_e2
    n = jnp.cross(e1, e2)
    gu_raw = jnp.cross(e2, n)
    gv_raw = jnp.cross(n, e1)
    du = jnp.sum(gu_raw * e1, axis=-1, keepdims=True)
    dv = jnp.sum(gv_raw * e2, axis=-1, keepdims=True)
    degen = (jnp.abs(du) < 1e-18) | (jnp.abs(dv) < 1e-18)
    gu = gu_raw / jnp.where(jnp.abs(du) < 1e-18, 1.0, du)
    gv = gv_raw / jnp.where(jnp.abs(dv) < 1e-18, 1.0, dv)
    d0 = -jnp.sum(n * v0, axis=-1)
    cu = -jnp.sum(gu * v0, axis=-1)
    cv = -jnp.sum(gv * v0, axis=-1)
    tid = jnp.where(degen[:, 0], -1, bvh.tri_id).astype(jnp.float32)
    rows = jnp.concatenate(
        [n.T, d0[None], gu.T, cu[None], gv.T, cv[None]], axis=0
    )  # [12, T]
    return rows, tid


def _dense_pallas_kernel(rayb_ref, trib_ref, ray_ref, tri_ref, tid_ref,
                         t_ref, f_ref, u_ref, v_ref, *, t_max: float):
    """One (ray_tile, tri_tile) program. Grid iterates tri tiles fastest, so
    the output blocks for a ray tile stay VMEM-resident and act as running
    (min-t, face, u, v) accumulators — zero [R,T] HBM traffic (the XLA
    plane-scan's bound). ~30 VPU ops per ray-triangle pair.

    Two-level culling: the whole body is predicated on the ray-tile AABB
    (segment endpoints clipped to the scene box) overlapping the triangle-
    tile AABB — triangles arrive in BVH leaf order, so tiles are spatially
    compact and most (ray tile, tri tile) pairs of a big mesh skip straight
    past the arithmetic."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_ref[...] = jnp.full_like(t_ref, t_max)
        f_ref[...] = jnp.full_like(f_ref, -1.0)
        u_ref[...] = jnp.zeros_like(u_ref)
        v_ref[...] = jnp.zeros_like(v_ref)

    # SMEM scalar reads: [1,6] per-tile boxes, cols 0-2 min / 3-5 max
    overlap = (
        (rayb_ref[0, 0] <= trib_ref[0, 3]) & (trib_ref[0, 0] <= rayb_ref[0, 3])
        & (rayb_ref[0, 1] <= trib_ref[0, 4]) & (trib_ref[0, 1] <= rayb_ref[0, 4])
        & (rayb_ref[0, 2] <= trib_ref[0, 5]) & (trib_ref[0, 2] <= rayb_ref[0, 5])
    )

    @pl.when(overlap)
    def _body():
        rays = ray_ref[...]                      # [bR, 8]
        tri = tri_ref[...]                       # [12, bT]
        tid = tid_ref[...]                       # [1, bT]
        o3 = rays[:, 0:3]
        d3 = rays[:, 3:6]
        d0, cu, cv = tri[3:4], tri[7:8], tri[11:12]

        # the six [bR,3]x[3,bT] contractions ride the MXU; the VPU only does
        # the ~15 elementwise ops below. HIGHEST precision is required: the
        # MXU's default bf16-truncated passes perturb t/u/v by ~1e-2, which
        # flips edge/silhouette hit tests (back-face t errors of the whole
        # chord length vs the f32 plane caster).
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        A = dot(o3, tri[0:3]) + d0               # [bR, bT]
        B = dot(d3, tri[0:3])
        safe = jnp.abs(B) > 1e-12
        t = -A / jnp.where(safe, B, 1.0)
        u = (dot(o3, tri[4:7]) + cu) + t * dot(d3, tri[4:7])
        v = (dot(o3, tri[8:11]) + cv) + t * dot(d3, tri[8:11])
        valid = (
            safe & (t > 1e-6)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (tid >= 0.0)
        )
        tm = jnp.where(valid, t, jnp.inf)

        # lane-reduce to this tile's best hit; first-lane tiebreak (iota must
        # be integer on TPU)
        lt = jnp.min(tm, axis=1, keepdims=True)                     # [bR,1]
        lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
        cand = jnp.where(tm == lt, lane, jnp.int32(1 << 30))
        first = lane == jnp.min(cand, axis=1, keepdims=True)
        pick = lambda x: jnp.sum(jnp.where(first, x, 0.0), axis=1, keepdims=True)
        better = (lt < t_ref[...]) & jnp.isfinite(lt)
        t_ref[...] = jnp.where(better, lt, t_ref[...])
        f_ref[...] = jnp.where(better, pick(jnp.broadcast_to(tid, tm.shape)), f_ref[...])
        u_ref[...] = jnp.where(better, pick(u), u_ref[...])
        v_ref[...] = jnp.where(better, pick(v), v_ref[...])


def _tile_aabbs_for_cull(bvh, rays_o, rays_d, t_max, block_r, block_t,
                         Rp, Tp):
    """Per-tile AABBs for the culled caster, [n_tiles, 6] f32
    (cols 0-2 min, 3-5 max). Ray tiles: each ray's segment is clipped to
    the scene box (slab test), the tile box is the union of the clipped
    endpoints; rays that miss the scene contribute an empty box."""
    tmin = jnp.minimum(
        jnp.minimum(bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1), bvh.tri_v0 + bvh.tri_e2
    )
    tmax = jnp.maximum(
        jnp.maximum(bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1), bvh.tri_v0 + bvh.tri_e2
    )
    T = tmin.shape[0]
    padT = Tp - T
    if padT:
        tmin = jnp.concatenate([tmin, jnp.full((padT, 3), jnp.inf)])
        tmax = jnp.concatenate([tmax, jnp.full((padT, 3), -jnp.inf)])
    tile_tmin = jnp.min(tmin.reshape(-1, block_t, 3), axis=1)
    tile_tmax = jnp.max(tmax.reshape(-1, block_t, 3), axis=1)

    scene_min = jnp.min(tile_tmin, axis=0)
    scene_max = jnp.max(tile_tmax, axis=0)

    R = rays_o.shape[0]
    padR = Rp - R
    if padR:  # pad rays far outside the scene -> empty segment boxes
        rays_o = jnp.concatenate([rays_o, jnp.full((padR, 3), 1e9)])
        rays_d = jnp.concatenate([rays_d, jnp.ones((padR, 3))])
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
    ta = (scene_min[None] - rays_o) * inv
    tb = (scene_max[None] - rays_o) * inv
    t0 = jnp.max(jnp.minimum(ta, tb), axis=1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=1)
    t0 = jnp.maximum(t0, 1e-6)
    t1 = jnp.minimum(t1, t_max)
    ok = (t1 >= t0)[:, None]
    p0 = rays_o + t0[:, None] * rays_d
    p1 = rays_o + t1[:, None] * rays_d
    rmin = jnp.where(ok, jnp.minimum(p0, p1), jnp.inf)
    rmax = jnp.where(ok, jnp.maximum(p0, p1), -jnp.inf)
    tile_rmin = jnp.min(rmin.reshape(-1, block_r, 3), axis=1)
    tile_rmax = jnp.max(rmax.reshape(-1, block_r, 3), axis=1)

    # [n, 1, 6]: trailing (1, 6) block dims match the array dims exactly,
    # which is what the SMEM BlockSpec lowering requires
    pack = lambda mn, mx: jnp.concatenate([mn, mx], axis=1)[:, None, :]
    return pack(tile_rmin, tile_rmax), pack(tile_tmin, tile_tmax)


def _expand_bits10(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of uint32 x so consecutive bits land 3 apart
    (the standard 3D Morton expansion)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _morton_ray_perm(bvh: FlatBVH, rays_o, rays_d, t_max):
    """Sort permutation that clusters rays whose scene-box ENTRY points are
    spatially close (30-bit Morton key of the entry point, quantized against
    the root AABB). Compact ray tiles make the caster's tile-AABB cull
    effective regardless of the caller's ray order: camera rows, vertex
    hemisphere fans and texel rays all become locally coherent. Rays that
    miss the scene sort to the end (key 2^30)."""
    root_min, root_max = bvh.node_min[0], bvh.node_max[0]
    ext = jnp.maximum(root_max - root_min, 1e-8)
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
    ta = (root_min[None] - rays_o) * inv
    tb = (root_max[None] - rays_o) * inv
    t0 = jnp.maximum(jnp.max(jnp.minimum(ta, tb), axis=1), 1e-6)
    t1 = jnp.minimum(jnp.min(jnp.maximum(ta, tb), axis=1), t_max)
    p0 = rays_o + t0[:, None] * rays_d
    q = jnp.clip((p0 - root_min[None]) / ext[None], 0.0, 1.0)
    q = (q * 1023.0).astype(jnp.uint32)
    key = (
        _expand_bits10(q[:, 0])
        | (_expand_bits10(q[:, 1]) << 1)
        | (_expand_bits10(q[:, 2]) << 2)
    )
    key = jnp.where(t1 >= t0, key, jnp.uint32(1 << 30))
    return jnp.argsort(key)


@functools.partial(
    jax.jit, static_argnames=("t_max", "block_r", "block_t", "interpret",
                              "reorder")
)
def cast_rays_dense_pallas(
    bvh: FlatBVH, rays_o, rays_d, t_max: float = MISS_DEPTH,
    block_r: int = 512, block_t: int = 512, interpret: bool = False,
    reorder: bool = True,
):
    """Pallas tiled dense caster: the default G-buffer/visibility caster on
    TPU. Same math as cast_rays_plane, but the running first-hit reduction
    lives in VMEM across triangle tiles instead of materializing [R,T]
    score arrays in HBM. With ``reorder`` (default) rays are Morton-sorted
    by scene-entry point first so the per-tile AABB cull bites: 2.8x on a
    512^2 camera view of a 327k-tri mesh vs raster order (v5e, 2026-08)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = rays_o.shape[0]
    if reorder:
        perm = _morton_ray_perm(bvh, rays_o, rays_d, t_max)
        rays_o = rays_o[perm]
        rays_d = rays_d[perm]
    rows, tid = _plane_tri_data(bvh)
    T = rows.shape[1]
    padT = (-T) % block_t
    if padT:
        rows = jnp.pad(rows, ((0, 0), (0, padT)))
        tid = jnp.pad(tid, (0, padT), constant_values=-1.0)
    padR = (-R) % block_r
    rays = jnp.concatenate(
        [rays_o.astype(jnp.float32), rays_d.astype(jnp.float32),
         jnp.zeros((R, 2), jnp.float32)], axis=1,
    )
    if padR:  # pad ROWS (extra rays); d=0 rays can never hit (B==0 -> safe
        # mask false), so padding lanes report miss
        rays = jnp.pad(rays, ((0, padR), (0, 0)))
    Rp, Tp = R + padR, T + padT

    ray_aabb, tri_aabb = _tile_aabbs_for_cull(
        bvh, rays_o, rays_d, t_max, block_r, block_t, Rp, Tp
    )
    grid = (Rp // block_r, Tp // block_t)  # tri tiles fastest (last dim)
    t, f, u, v = pl.pallas_call(
        functools.partial(_dense_pallas_kernel, t_max=t_max),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, 6), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, 6), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((12, block_t), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_t), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(ray_aabb, tri_aabb, rays, rows, tid[None])
    t, f, u, v = t[:R, 0], f[:R, 0], u[:R, 0], v[:R, 0]
    if reorder:  # scatter back to caller order
        inv = jnp.zeros((R,), jnp.int32).at[perm].set(
            jnp.arange(R, dtype=jnp.int32), mode="promise_in_bounds"
        )
        t, f, u, v = t[inv], f[inv], u[inv], v[inv]
    face = f.astype(jnp.int32)
    hit = face >= 0
    return {
        "t": jnp.where(hit, t, MISS_DEPTH),
        "face": face,
        "u": jnp.where(hit, u, 0.0),
        "v": jnp.where(hit, v, 0.0),
        "hit": hit,
    }


def cast_rays_chunked(bvh: FlatBVH, rays_o, rays_d, chunk: int = 1 << 16, t_max: float = MISS_DEPTH):
    """Dispatch to the dense tiled caster for small/medium meshes (see
    DENSE_CAST_MAX_TRIS; Pallas on TPU, plane-equation XLA scan elsewhere)
    or the BVH while-loop traversal in fixed-size ray chunks for big ones."""
    if bvh.tri_packed.shape[0] <= DENSE_CAST_MAX_TRIS:
        from dreammat_tpu.utils.hw import is_tpu_backend

        if is_tpu_backend():
            return cast_rays_dense_pallas(bvh, rays_o, rays_d, t_max=t_max)
        return cast_rays_plane(bvh, rays_o, rays_d, t_max=t_max)
    R = rays_o.shape[0]
    pad = (-R) % chunk
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3), rays_o.dtype)])
        rays_d = jnp.concatenate([rays_d, jnp.ones((pad, 3), rays_d.dtype)])
    ro = rays_o.reshape(-1, chunk, 3)
    rd = rays_d.reshape(-1, chunk, 3)
    out = jax.lax.map(lambda ab: cast_rays(bvh, ab[0], ab[1], t_max=t_max), (ro, rd))
    out = jax.tree_util.tree_map(lambda x: x.reshape(-1, *x.shape[2:])[:R], out)
    return out


def occlusion_rays(bvh: FlatBVH, rays_o, rays_d, t_max: float = MISS_DEPTH):
    """Any-hit style occlusion query (uses first-hit traversal; a hit closer
    than t_max means occluded). Returns bool [R]."""
    return cast_rays(bvh, rays_o, rays_d, t_max=t_max)["hit"]


# ---------------------------------------------------------------------------
# brute-force reference (for tests)
# ---------------------------------------------------------------------------

def cast_rays_bruteforce(vertices, faces, rays_o, rays_d, t_max: float = MISS_DEPTH):
    v = jnp.asarray(vertices)
    f = jnp.asarray(faces)
    v0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - v0
    e2 = v[f[:, 2]] - v0
    R = rays_o.shape[0]
    F = f.shape[0]
    t, u, vv, valid = _tri_hits(
        jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.broadcast_to(v0, (R, F, 3)),
        jnp.broadcast_to(e1, (R, F, 3)),
        jnp.broadcast_to(e2, (R, F, 3)),
    )
    t = jnp.where(valid & (t < t_max), t, jnp.inf)
    idx = jnp.argmin(t, axis=-1)
    tbest = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
    hit = jnp.isfinite(tbest)
    return {
        "t": jnp.where(hit, tbest, MISS_DEPTH),
        "face": jnp.where(hit, idx.astype(jnp.int32), -1),
        "u": jnp.take_along_axis(u, idx[:, None], axis=-1)[:, 0],
        "v": jnp.take_along_axis(vv, idx[:, None], axis=-1)[:, 0],
        "hit": hit,
    }
