"""Triangle mesh type + host-side IO.

TPU-native counterpart of the reference ``Mesh``
(/root/reference/threestudio_dreammat/threestudio/models/mesh.py:12-311) and
the mesh loading/normalization in
``geometry/dreammat_mesh.py:148-206``: a frozen pytree of device arrays with
host-side loaders (OBJ/PLY/GLB without trimesh) and lazily computed vertex
normals. Geometry is frozen on the DreamMat path, so no gradients flow to
vertices and everything here is precomputed once per mesh.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# host-side loaders (no trimesh in the TPU image)
# ---------------------------------------------------------------------------

def load_obj(path: str):
    """Minimal OBJ reader: v / vn / vt / f (triangulating fans)."""
    verts, normals, uvs = [], [], []
    faces, faces_uv, faces_n = [], [], []
    with open(path, "r", errors="ignore") as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vn "):
                normals.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                uvs.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("f "):
                toks = line.split()[1:]
                idx = []
                for t in toks:
                    parts = t.split("/")
                    vi = int(parts[0])
                    ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
                    ni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
                    idx.append((vi, ti, ni))
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tri = [idx[0], idx[k], idx[k + 1]]
                    faces.append([t[0] - 1 if t[0] > 0 else len(verts) + t[0] for t in tri])
                    faces_uv.append([t[1] - 1 if t[1] > 0 else len(uvs) + t[1] for t in tri])
                    faces_n.append([t[2] - 1 if t[2] > 0 else len(normals) + t[2] for t in tri])
    v = np.asarray(verts, dtype=np.float32)
    f = np.asarray(faces, dtype=np.int32)
    vt = np.asarray(uvs, dtype=np.float32) if uvs else None
    ft = np.asarray(faces_uv, dtype=np.int32) if uvs else None
    return v, f, vt, ft


def load_ply(path: str):
    """Binary/ascii PLY reader for vertex positions + faces."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii", errors="ignore").splitlines()
    fmt = "ascii"
    nv = nf = 0
    vert_props = []
    reading = None
    for line in header:
        t = line.split()
        if not t:
            continue
        if t[0] == "format":
            fmt = t[1]
        elif t[0] == "element":
            reading = t[1]
            if t[1] == "vertex":
                nv = int(t[2])
            elif t[1] == "face":
                nf = int(t[2])
        elif t[0] == "property" and reading == "vertex":
            vert_props.append((t[-1], t[1]))
    if fmt == "ascii":
        body = data[header_end:].decode("ascii").split()
        pos = 0
        verts = np.zeros((nv, 3), dtype=np.float32)
        stride = len(vert_props)
        names = [p[0] for p in vert_props]
        xi, yi, zi = names.index("x"), names.index("y"), names.index("z")
        for i in range(nv):
            row = body[pos : pos + stride]
            verts[i] = [float(row[xi]), float(row[yi]), float(row[zi])]
            pos += stride
        faces = []
        while pos < len(body):
            n = int(body[pos])
            idx = [int(x) for x in body[pos + 1 : pos + 1 + n]]
            for k in range(1, n - 1):
                faces.append([idx[0], idx[k], idx[k + 1]])
            pos += n + 1
        return verts, np.asarray(faces, dtype=np.int32), None, None
    # binary little endian
    sizes = {"float": 4, "float32": 4, "double": 8, "uchar": 1, "uint8": 1,
             "int": 4, "int32": 4, "uint": 4, "uint32": 4, "short": 2, "ushort": 2}
    endian = "<" if "little" in fmt else ">"
    off = header_end
    stride = sum(sizes[p[1]] for p in vert_props)
    verts = np.zeros((nv, 3), dtype=np.float32)
    names = [p[0] for p in vert_props]
    offs = {}
    o = 0
    for nme, typ in vert_props:
        offs[nme] = (o, typ)
        o += sizes[typ]
    for i in range(nv):
        base = off + i * stride
        vals = []
        for axis in ("x", "y", "z"):
            ao, typ = offs[axis]
            fmtc = {"float": "f", "float32": "f", "double": "d"}[typ]
            vals.append(struct.unpack_from(endian + fmtc, data, base + ao)[0])
        verts[i] = vals
    off += nv * stride
    faces = []
    while off < len(data) and len(faces) < nf * 2:
        n = struct.unpack_from(endian + "B", data, off)[0]
        off += 1
        idx = struct.unpack_from(endian + f"{n}i", data, off)
        off += 4 * n
        for k in range(1, n - 1):
            faces.append([idx[0], idx[k], idx[k + 1]])
    return verts, np.asarray(faces, dtype=np.int32), None, None


def load_glb(path: str):
    """Minimal binary glTF (.glb) reader: first mesh primitive set,
    POSITION + indices (+ TEXCOORD_0), concatenated across primitives."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version, length = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67, "not a glb file"
    off = 12
    js = None
    binbuf = b""
    while off < length:
        clen, ctype = struct.unpack_from("<II", data, off)
        off += 8
        chunk = data[off : off + clen]
        off += clen
        if ctype == 0x4E4F534A:
            js = json.loads(chunk.decode("utf-8"))
        elif ctype == 0x004E4942:
            binbuf = chunk
    assert js is not None

    def read_accessor(idx):
        acc = js["accessors"][idx]
        bv = js["bufferViews"][acc["bufferView"]]
        comp = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
                5123: np.uint16, 5125: np.uint32, 5126: np.float32}[acc["componentType"]]
        ncomp = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}[acc["type"]]
        start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        count = acc["count"]
        itemsize = np.dtype(comp).itemsize * ncomp
        stride = bv.get("byteStride", itemsize)
        if stride == itemsize:
            arr = np.frombuffer(binbuf, dtype=comp, count=count * ncomp, offset=start)
        else:
            rows = [
                np.frombuffer(binbuf, dtype=comp, count=ncomp, offset=start + i * stride)
                for i in range(count)
            ]
            arr = np.concatenate(rows)
        return arr.reshape(count, ncomp) if ncomp > 1 else arr

    all_v, all_f, all_vt = [], [], []
    base = 0
    for mesh in js.get("meshes", []):
        for prim in mesh.get("primitives", []):
            v = read_accessor(prim["attributes"]["POSITION"]).astype(np.float32)
            if "indices" in prim:
                f_idx = read_accessor(prim["indices"]).astype(np.int64).reshape(-1, 3)
            else:
                f_idx = np.arange(len(v), dtype=np.int64).reshape(-1, 3)
            all_v.append(v)
            all_f.append(f_idx + base)
            if "TEXCOORD_0" in prim["attributes"]:
                all_vt.append(read_accessor(prim["attributes"]["TEXCOORD_0"]).astype(np.float32))
            base += len(v)
    v = np.concatenate(all_v, 0)
    f = np.concatenate(all_f, 0).astype(np.int32)
    vt = np.concatenate(all_vt, 0) if len(all_vt) == len(all_v) and all_vt else None
    ft = f if vt is not None and len(vt) == len(v) else None
    return v, f, vt, ft


def compute_vertex_normals(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (matches reference mesh.py:135-156)."""
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)  # area-weighted (unnormalized)
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    vn = np.where(norm > 1e-20, vn / np.maximum(norm, 1e-20), np.array([0.0, 0.0, 1.0]))
    return vn.astype(np.float32)


# ---------------------------------------------------------------------------
# Mesh pytree
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class Mesh:
    v_pos: jnp.ndarray  # [V,3] float32
    t_pos_idx: jnp.ndarray  # [F,3] int32
    v_nrm: Optional[jnp.ndarray] = None  # [V,3]
    v_tex: Optional[jnp.ndarray] = None  # [V,2]
    t_tex_idx: Optional[jnp.ndarray] = None  # [F,3]

    def tree_flatten(self):
        return (self.v_pos, self.t_pos_idx, self.v_nrm, self.v_tex, self.t_tex_idx), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def face_normals(self):
        v0 = self.v_pos[self.t_pos_idx[:, 0]]
        v1 = self.v_pos[self.t_pos_idx[:, 1]]
        v2 = self.v_pos[self.t_pos_idx[:, 2]]
        n = jnp.cross(v1 - v0, v2 - v0)
        return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-20)


_DIR2VEC = {
    "+x": np.array([1, 0, 0]), "+y": np.array([0, 1, 0]), "+z": np.array([0, 0, 1]),
    "-x": np.array([-1, 0, 0]), "-y": np.array([0, -1, 0]), "-z": np.array([0, 0, -1]),
}


def load_mesh(
    path: str,
    scale: Optional[float] = None,
    mesh_up: str = "+z",
    mesh_front: str = "+x",
) -> Mesh:
    """Load + normalize a mesh the way the reference does
    (dreammat_mesh.py:148-206): center at vertex centroid, rotate so that
    ``mesh_up``/``mesh_front`` map to +z/+x, and scale the max |coord| to
    ``scale``."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        v, f, vt, ft = load_obj(path)
    elif ext == ".ply":
        v, f, vt, ft = load_ply(path)
    elif ext in (".glb", ".gltf"):
        v, f, vt, ft = load_glb(path)
    else:
        raise ValueError(f"unsupported mesh format {ext}")

    v = v - v.mean(axis=0, keepdims=True)
    if scale is not None:
        z_ = _DIR2VEC[mesh_up].astype(np.float64)
        x_ = _DIR2VEC[mesh_front].astype(np.float64)
        y_ = np.cross(z_, x_)
        std2mesh = np.stack([x_, y_, z_], axis=0).T
        mesh2std = np.linalg.inv(std2mesh)
        v = v / np.abs(v).max() * scale
        v = (mesh2std @ v.T).T.astype(np.float32)

    f = fix_winding_outward(v, f, name=path)
    vn = compute_vertex_normals(v, f)
    return Mesh(
        v_pos=jnp.asarray(v, dtype=jnp.float32),
        t_pos_idx=jnp.asarray(f, dtype=jnp.int32),
        v_nrm=jnp.asarray(vn),
        v_tex=jnp.asarray(vt) if vt is not None else None,
        t_tex_idx=jnp.asarray(ft, dtype=jnp.int32) if ft is not None else None,
    )


def fix_winding_outward(v: np.ndarray, f: np.ndarray,
                        name: str = "mesh") -> np.ndarray:
    """Flip an inside-out mesh's face winding so normals point outward.

    An inverted winding is silent and catastrophic downstream: every
    visibility-bake origin (``pt + eps * nrm``) lands INSIDE the closed
    surface, so every octahedral table row bakes to all-occluded and the
    MC estimators sample their hemisphere around an inward normal (found
    the hard way — see tools/quantify_fastpath.py::make_torus history,
    ROADMAP #44). The divergence-theorem signed volume
    ``sum(det[v0 v1 v2]) / 6`` is positive for CCW-outward winding on a
    closed mesh, so its sign decides; near-zero volume (open sheets,
    self-cancelling geometry) is left untouched. (The reference loads
    through ``trimesh.load`` — dreammat_mesh.py:150 — whose processed
    winding/normal handling this replaces.)"""
    w = v.astype(np.float64)[f]                       # [F,3,3]
    vol6 = float(np.sum(np.linalg.det(w)))
    scale = float(np.abs(v).max()) or 1.0
    if vol6 < -1e-6 * scale**3:
        import logging

        logging.getLogger("dreammat-tpu").warning(
            "%s: negative signed volume (%.3g) - flipping face winding so "
            "normals point outward", name, vol6 / 6.0)
        return f[:, [0, 2, 1]]
    return f


# ---------------------------------------------------------------------------
# procedural test meshes (no reliance on external assets)
# ---------------------------------------------------------------------------

def make_icosphere(subdiv: int = 2, radius: float = 1.0) -> Mesh:
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
        dtype=np.float64,
    )
    faces = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        dtype=np.int64,
    )
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    for _ in range(subdiv):
        edge_map = {}
        new_faces = []
        vlist = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_map:
                m = vlist[a] + vlist[b]
                m = m / np.linalg.norm(m)
                edge_map[key] = len(vlist)
                vlist.append(m)
            return edge_map[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces, dtype=np.int64)
    v = (verts * radius).astype(np.float32)
    f = faces.astype(np.int32)
    return Mesh(
        v_pos=jnp.asarray(v),
        t_pos_idx=jnp.asarray(f),
        v_nrm=jnp.asarray(compute_vertex_normals(v, f)),
    )


def make_box(half: float = 0.5) -> Mesh:
    corners = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)],
        dtype=np.float32,
    )
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    f = np.array(faces, dtype=np.int32)
    return Mesh(
        v_pos=jnp.asarray(corners),
        t_pos_idx=jnp.asarray(f),
        v_nrm=jnp.asarray(compute_vertex_normals(corners, f)),
    )


# ---------------------------------------------------------------------------
# mesh regularization losses (reference mesh.py:253-311)
# ---------------------------------------------------------------------------

def build_edge_adjacency(f: np.ndarray):
    """Host-side: unique edges [E,2] and per-vertex neighbor CSR for the
    uniform laplacian; plus edge->(face,face) pairs for normal consistency."""
    edges = {}
    for fi in range(f.shape[0]):
        for k in range(3):
            a, b = int(f[fi, k]), int(f[fi, (k + 1) % 3])
            key = (min(a, b), max(a, b))
            edges.setdefault(key, []).append(fi)
    edge_arr = np.asarray(sorted(edges.keys()), dtype=np.int32)
    pairs = [
        (fl[0], fl[1]) for fl in edges.values() if len(fl) >= 2
    ]
    face_pairs = np.asarray(pairs, dtype=np.int32) if pairs else np.zeros((0, 2), np.int32)
    return edge_arr, face_pairs


def laplacian_loss(v_pos: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """Uniform-weight laplacian smoothness (reference mesh.py:253-282):
    ||v - mean(neighbors)||; computed edge-wise via scatter means."""
    V = v_pos.shape[0]
    a, b = edges[:, 0], edges[:, 1]
    acc = jnp.zeros((V, 3)).at[a].add(v_pos[b]).at[b].add(v_pos[a])
    cnt = jnp.zeros((V,)).at[a].add(1.0).at[b].add(1.0)
    mean_nb = acc / jnp.maximum(cnt, 1.0)[:, None]
    return jnp.mean(jnp.linalg.norm(v_pos - mean_nb, axis=-1))


def normal_consistency_loss(mesh: "Mesh", face_pairs: jnp.ndarray) -> jnp.ndarray:
    """1 - cos between adjacent face normals (reference mesh.py:284-311)."""
    fn = mesh.face_normals
    n0 = fn[face_pairs[:, 0]]
    n1 = fn[face_pairs[:, 1]]
    return jnp.mean(1.0 - jnp.sum(n0 * n1, axis=-1))


def subdivide_mesh(mesh: Mesh, levels: int = 1,
                   max_verts: int = 1 << 20) -> Mesh:
    """Uniform midpoint (1:4) subdivision of the SAME geometric surface —
    no smoothing, vertices stay on the original triangles.

    Purpose: visibility-sample densification. The baked-visibility fast
    path stores vis(x, omega) per VERTEX and barycentrically interpolates
    (ops/visibility.py) — the reference instead traces exact per-step rays
    at every pixel (dreammat_material.py:490-507), so coarse triangles
    under hard self-occlusion (torus class) are the binding approximation.
    Subdividing the renderer's mesh quadruples the spatial sample density
    per level while rendering identically (midpoints are convex combos;
    shared-edge midpoints are deduplicated so the surface stays watertight).

    Authored vertex normals are angle-preserved by slerp-free averaging
    (normalize(n_a + n_b)); UVs are midpoint-interpolated on the texture
    topology with the same face-split pattern so t_tex_idx stays aligned
    with t_pos_idx. Stops before a level that would exceed ``max_verts``.
    """

    def split_topology(verts, faces):
        """One midpoint split: returns (new_verts_attr_fn, new_faces).
        new_verts_attr_fn(attr[V,C]) -> attr[V+E,C] with midpoint rows."""
        F = faces.shape[0]
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
        )
        uniq, inv = np.unique(np.sort(edges, axis=1), axis=0, return_inverse=True)
        V = verts.shape[0]
        m01 = V + inv[:F]
        m12 = V + inv[F:2 * F]
        m20 = V + inv[2 * F:]
        v0, v1, v2 = faces[:, 0], faces[:, 1], faces[:, 2]
        new_faces = np.concatenate([
            np.stack([v0, m01, m20], axis=1),
            np.stack([v1, m12, m01], axis=1),
            np.stack([v2, m20, m12], axis=1),
            np.stack([m01, m12, m20], axis=1),
        ], axis=0).astype(np.int32)

        def expand(attr, normalize=False):
            mids = 0.5 * (attr[uniq[:, 0]] + attr[uniq[:, 1]])
            if normalize:
                mids = mids / (np.linalg.norm(mids, axis=-1, keepdims=True) + 1e-12)
            return np.concatenate([attr, mids], axis=0)

        return expand, new_faces

    v = np.asarray(mesh.v_pos, np.float64)
    f = np.asarray(mesh.t_pos_idx, np.int64)
    vn = np.asarray(mesh.v_nrm, np.float64) if mesh.v_nrm is not None else None
    vt = np.asarray(mesh.v_tex, np.float64) if mesh.v_tex is not None else None
    ft = np.asarray(mesh.t_tex_idx, np.int64) if mesh.t_tex_idx is not None else None

    for _ in range(max(int(levels), 0)):
        # each level adds one vertex per unique edge (E ~ 1.5F)
        n_edges = len(np.unique(np.sort(np.concatenate(
            [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1), axis=0))
        if v.shape[0] + n_edges > max_verts:
            break
        expand, f_new = split_topology(v, f)
        v = expand(v)
        if vn is not None:
            vn = expand(vn, normalize=True)
        if vt is not None and ft is not None:
            expand_t, ft_new = split_topology(vt, ft)
            vt = expand_t(vt)
            ft = ft_new
        f = f_new

    return Mesh(
        v_pos=jnp.asarray(v, jnp.float32),
        t_pos_idx=jnp.asarray(f, jnp.int32),
        v_nrm=jnp.asarray(vn, jnp.float32) if vn is not None
        else jnp.asarray(compute_vertex_normals(
            v.astype(np.float32), f.astype(np.int32))),
        v_tex=jnp.asarray(vt, jnp.float32) if vt is not None else None,
        t_tex_idx=jnp.asarray(ft, jnp.int32) if ft is not None else None,
    )
