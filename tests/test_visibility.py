import jax
import jax.numpy as jnp
import numpy as np

from dreammat_tpu.models import mesh as mesh_lib
from dreammat_tpu.ops import bvh as bvh_lib
from dreammat_tpu.ops import visibility as vis_lib


def test_octahedral_roundtrip():
    rng = np.random.RandomState(0)
    d = rng.normal(size=(256, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, dtype=jnp.float32)
    uv = vis_lib.dir_to_oct_uv(d)
    back = vis_lib.oct_uv_to_dir(uv)
    assert np.allclose(np.asarray(back), np.asarray(d), atol=1e-5)
    assert float(uv.min()) >= 0.0 and float(uv.max()) <= 1.0


def test_dir_to_bin_range():
    rng = np.random.RandomState(1)
    d = rng.normal(size=(100, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), dtype=jnp.float32)
    bins = vis_lib.dir_to_bin(d, 8)
    assert int(bins.min()) >= 0 and int(bins.max()) < 64


def test_bake_convex_sphere_fully_visible():
    """A convex body never self-occludes: all outward bins are visible."""
    m = mesh_lib.make_icosphere(2)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    baked = vis_lib.bake_vertex_visibility(bvh, m.v_pos, m.v_nrm, oct_res=8, eps=1e-2)
    V = m.v_pos.shape[0]
    assert baked.table.shape == (V, 64)
    # outward directions (dot(normal, dir) > 0.2) must all be visible
    xs = (jnp.arange(8, dtype=jnp.float32) + 0.5) / 8
    uu, vv = jnp.meshgrid(xs, xs, indexing="xy")
    dirs = vis_lib.oct_uv_to_dir(jnp.stack([uu.reshape(-1), vv.reshape(-1)], -1))
    nrm = np.asarray(m.v_nrm)
    outward = np.asarray(jnp.einsum("vd,bd->vb", m.v_nrm, dirs)) > 0.2
    tbl = np.asarray(baked.table, dtype=np.float32)
    assert (tbl[outward] > 0.5).mean() > 0.99


def test_bake_occluder_blocks():
    """Two stacked spheres: the upper hemisphere of the lower sphere's top
    vertices must be (partly) occluded by the upper sphere."""
    m1 = mesh_lib.make_icosphere(2)
    v1 = np.asarray(m1.v_pos)
    f1 = np.asarray(m1.t_pos_idx)
    v2 = v1 + np.asarray([0.0, 0.0, 2.5])
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f1 + len(v1)])
    bvh = bvh_lib.build_bvh(v, f)
    nrm = np.concatenate([np.asarray(m1.v_nrm)] * 2)
    baked = vis_lib.bake_vertex_visibility(
        bvh, jnp.asarray(v), jnp.asarray(nrm), oct_res=8, eps=1e-2
    )
    # top vertex of the LOWER sphere, direction +z -> occluded by upper sphere
    top_idx = int(np.argmax(v1[:, 2]))
    up_bin = int(vis_lib.dir_to_bin(jnp.asarray([[0.0, 0.0, 1.0]]), 8)[0])
    assert float(baked.table[top_idx, up_bin]) < 0.5
    # sideways direction stays visible
    side_bin = int(vis_lib.dir_to_bin(jnp.asarray([[1.0, 0.0, 0.0]]), 8)[0])
    assert float(baked.table[top_idx, side_bin]) > 0.5


def test_lookup_barycentric_mix():
    baked = vis_lib.BakedVisibility(
        table=jnp.asarray([[1.0] * 4, [0.0] * 4, [1.0] * 4], dtype=jnp.float16),
        oct_res=2,
    )
    tri = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    bary = jnp.asarray([[0.5, 0.5, 0.0]])
    dirs = jnp.asarray([[[0.0, 0.0, 1.0]]])
    vis = vis_lib.lookup_visibility(baked, tri, bary, dirs)
    assert abs(float(vis[0, 0]) - 0.5) < 1e-3


def test_bake_supersample_fractional_bins():
    """supersample>1 stores fractional bin visibility: near an occluder
    edge the bin takes values strictly between 0 and 1, and on a convex
    sphere it agrees with the binary bake (all-visible outward bins)."""
    m1 = mesh_lib.make_icosphere(2)
    v1 = np.asarray(m1.v_pos)
    f1 = np.asarray(m1.t_pos_idx)
    v2 = v1 + np.asarray([0.0, 0.0, 2.5])
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f1 + len(v1)])
    bvh = bvh_lib.build_bvh(v, f)
    nrm = np.concatenate([np.asarray(m1.v_nrm)] * 2)
    b1 = vis_lib.bake_vertex_visibility(
        bvh, jnp.asarray(v), jnp.asarray(nrm), oct_res=8, eps=1e-2, supersample=1
    )
    b4 = vis_lib.bake_vertex_visibility(
        bvh, jnp.asarray(v), jnp.asarray(nrm), oct_res=8, eps=1e-2, supersample=4
    )
    t1 = np.asarray(b1.table, np.float32)
    t4 = np.asarray(b4.table, np.float32)
    assert t1.shape == t4.shape
    # binary bake only emits {0,1}; supersampled bake must produce
    # fractional bins where the upper sphere's silhouette crosses bins
    frac = (t4 > 0.05) & (t4 < 0.95)
    assert frac.any(), "expected fractional bins at the occluder silhouette"
    # the two bakes agree where both are saturated (mean |diff| small)
    assert float(np.abs(t1 - t4).mean()) < 0.1
    # convex sphere alone: supersampled outward bins still fully visible
    bvh1 = bvh_lib.build_bvh(v1, f1)
    bs = vis_lib.bake_vertex_visibility(
        bvh1, m1.v_pos, m1.v_nrm, oct_res=8, eps=1e-2, supersample=2
    )
    xs = (jnp.arange(8, dtype=jnp.float32) + 0.5) / 8
    uu, vv = jnp.meshgrid(xs, xs, indexing="xy")
    dirs = vis_lib.oct_uv_to_dir(jnp.stack([uu.reshape(-1), vv.reshape(-1)], -1))
    outward = np.asarray(jnp.einsum("vd,bd->vb", m1.v_nrm, dirs)) > 0.2
    assert (np.asarray(bs.table, np.float32)[outward] > 0.9).mean() > 0.99


def _make_torus(R=0.7, r=0.28, nu=24, nv=12):
    us = np.arange(nu) / nu * 2 * np.pi
    vs = np.arange(nv) / nv * 2 * np.pi
    uu, vv = np.meshgrid(us, vs, indexing="ij")
    x = (R + r * np.cos(vv)) * np.cos(uu)
    y = (R + r * np.cos(vv)) * np.sin(uu)
    z = r * np.sin(vv)
    v = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)
    f = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            f += [[a, b, c], [a, c, d]]
    f = np.asarray(f, np.int32)
    return mesh_lib.Mesh(
        v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(f),
        v_nrm=jnp.asarray(mesh_lib.compute_vertex_normals(v, f)),
    )


def test_subdivide_mesh_same_surface():
    """Midpoint subdivision: V'=V+E, F'=4F, new vertices lie on original
    edges, surface area unchanged, normals unit."""
    m = mesh_lib.make_icosphere(1)
    V = int(m.v_pos.shape[0])
    F = int(m.t_pos_idx.shape[0])
    E = V + F - 2  # Euler, genus 0
    s = mesh_lib.subdivide_mesh(m, 1)
    assert int(s.t_pos_idx.shape[0]) == 4 * F
    assert int(s.v_pos.shape[0]) == V + E

    def area(mm):
        v = np.asarray(mm.v_pos)
        f = np.asarray(mm.t_pos_idx)
        e1 = v[f[:, 1]] - v[f[:, 0]]
        e2 = v[f[:, 2]] - v[f[:, 0]]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()

    assert np.isclose(area(s), area(m), rtol=1e-6)
    assert np.allclose(np.linalg.norm(np.asarray(s.v_nrm), axis=-1), 1.0, atol=1e-5)
    # two levels via the level loop
    s2 = mesh_lib.subdivide_mesh(m, 2)
    assert int(s2.t_pos_idx.shape[0]) == 16 * F
    # budget guard: refuses a level that would blow the vertex budget
    s_cap = mesh_lib.subdivide_mesh(m, 5, max_verts=V + E + 1)
    assert int(s_cap.v_pos.shape[0]) == V + E


def test_subdivide_mesh_uv_topology():
    """UV seams: the tex topology is split with the same pattern so
    t_tex_idx stays aligned and interpolated UVs are exact midpoints."""
    m = mesh_lib.make_icosphere(1)
    # synthetic independent tex topology: per-face corner UVs (all seams)
    F = int(m.t_pos_idx.shape[0])
    vt = np.random.RandomState(0).rand(3 * F, 2).astype(np.float32)
    ft = np.arange(3 * F, dtype=np.int32).reshape(F, 3)
    m = mesh_lib.Mesh(v_pos=m.v_pos, t_pos_idx=m.t_pos_idx, v_nrm=m.v_nrm,
                      v_tex=jnp.asarray(vt), t_tex_idx=jnp.asarray(ft))
    s = mesh_lib.subdivide_mesh(m, 1)
    assert s.t_tex_idx.shape == s.t_pos_idx.shape
    # face ordering aligned: barycentric center UV of subface equals the
    # interpolation of parent-face UVs at the matching positions
    f_pos = np.asarray(s.t_pos_idx)
    f_tex = np.asarray(s.t_tex_idx)
    v = np.asarray(s.v_pos)
    t = np.asarray(s.v_tex)
    # exact value check: children of parent face i sit at rows
    # [i, i+F, i+2F, i+3F] with corner layout [v0,m01,m20], [v1,m12,m01],
    # [v2,m20,m12], [m01,m12,m20]; the tex split uses the same pattern, so
    # each child's UV corners must be exact midpoints/corners of the
    # parent's UV triangle (t0,t1,t2).
    for i in range(0, F, 7):
        t0, t1, t2 = vt[ft[i]]
        m01, m12, m20 = 0.5 * (t0 + t1), 0.5 * (t1 + t2), 0.5 * (t2 + t0)
        expect = [(t0, m01, m20), (t1, m12, m01), (t2, m20, m12),
                  (m01, m12, m20)]
        for c, exp in enumerate(expect):
            got = t[f_tex[i + c * F]]
            assert np.allclose(got, np.stack(exp), atol=1e-6), (i, c)
    # and the position topology pairs with it: child corner k's position is
    # the same corner/midpoint of the parent position triangle
    vp = np.asarray(m.v_pos)
    fp = np.asarray(m.t_pos_idx)
    for i in range(0, F, 7):
        p0, p1, p2 = vp[fp[i]]
        pm01, pm12, pm20 = 0.5 * (p0 + p1), 0.5 * (p1 + p2), 0.5 * (p2 + p0)
        expect = [(p0, pm01, pm20), (p1, pm12, pm01), (p2, pm20, pm12),
                  (pm01, pm12, pm20)]
        for c, exp in enumerate(expect):
            got = v[f_pos[i + c * F]]
            assert np.allclose(got, np.stack(exp), atol=1e-6), (i, c)


def test_torus_visibility_error_bound_by_direction_resolution():
    """On a self-occluding torus the baked-visibility error is bound by the
    DIRECTIONAL octahedral resolution, not per-vertex spatial density:
    one midpoint-subdivision level (4x denser vertices) barely moves the
    pointwise error while doubling oct_res cuts it materially. This is the
    r3 diagnosis of the VERDICT r2 torus grad-cos gap, and why the lookup
    default is bilinear over the octahedral bins."""
    m = _make_torus()
    bvh0 = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))

    # sample points ON the surface (random barycentric per face subset)
    rs = np.random.RandomState(1)
    f = np.asarray(m.t_pos_idx)
    v = np.asarray(m.v_pos)
    vn = np.asarray(m.v_nrm)
    fid = rs.randint(0, len(f), 160)
    b = rs.rand(160, 3)
    b /= b.sum(axis=1, keepdims=True)
    pts = (v[f[fid]] * b[..., None]).sum(axis=1).astype(np.float32)
    nrm = (vn[f[fid]] * b[..., None]).sum(axis=1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-9

    # random upper-hemisphere directions per point
    d = rs.randn(160, 8, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    flip = (d * nrm[:, None]).sum(-1, keepdims=True) < 0
    d = np.where(flip, -d, d)

    # exact visibility at the sample points
    o = (pts[:, None] + nrm[:, None] * 1e-3 + d * 1e-3).reshape(-1, 3)
    out = bvh_lib.cast_rays(bvh0, jnp.asarray(o), jnp.asarray(d.reshape(-1, 3)))
    exact = 1.0 - np.asarray(out["hit"]).astype(np.float32).reshape(160, 8)

    def baked_err(mesh, fid_map, bary_map, oct_res=16):
        bvh = bvh_lib.build_bvh(np.asarray(mesh.v_pos), np.asarray(mesh.t_pos_idx))
        baked = vis_lib.bake_vertex_visibility(
            bvh, mesh.v_pos, mesh.v_nrm, oct_res=oct_res, supersample=2)
        tri = np.asarray(mesh.t_pos_idx)[fid_map]
        vis = np.asarray(vis_lib.lookup_visibility(
            baked, jnp.asarray(tri), jnp.asarray(bary_map), jnp.asarray(d)))
        return np.abs(vis - exact).mean()

    err0 = baked_err(m, fid, b.astype(np.float32))

    s = mesh_lib.subdivide_mesh(m, 1)
    # map each sample to its child face + child barycentrics: child layout is
    # [v0,m01,m20], [v1,m12,m01], [v2,m20,m12], [m01,m12,m20] at rows
    # fid, fid+F, fid+2F, fid+3F
    F = len(f)
    u, w, z = b[:, 0], b[:, 1], b[:, 2]
    child = np.where(u >= 0.5, 0, np.where(w >= 0.5, 1, np.where(z >= 0.5, 2, 3)))
    fid_s = fid + child * F
    bary_s = np.zeros_like(b)
    for i, c in enumerate(child):
        uu, ww, zz = u[i], w[i], z[i]
        if c == 0:    # corners v0, m01, m20
            bary_s[i] = [2 * uu - 1, 2 * ww, 2 * zz]
        elif c == 1:  # v1, m12, m01
            bary_s[i] = [2 * ww - 1, 2 * zz, 2 * uu]
        elif c == 2:  # v2, m20, m12
            bary_s[i] = [2 * zz - 1, 2 * uu, 2 * ww]
        else:         # m01, m12, m20
            bary_s[i] = [1 - 2 * zz, 1 - 2 * uu, 1 - 2 * ww]
    err1 = baked_err(s, fid_s, bary_s.astype(np.float32))
    # measured diagnosis (r3, hardware + this harness): subdivision alone
    # does NOT materially move the pointwise visibility error — the binding
    # approximation is DIRECTIONAL table resolution, not spatial density.
    # Pin both halves of that finding: (a) subdivision is never a
    # regression, (b) doubling oct_res cuts the error materially while
    # subdivision moves it by less than a third of that cut.
    err_oct32 = baked_err(m, fid, b.astype(np.float32), oct_res=32)
    assert err1 < err0 * 1.05, (err0, err1)
    assert err_oct32 < err0 * 0.85, (err0, err_oct32)
    assert abs(err0 - err1) < (err0 - err_oct32) / 3.0, (err0, err1, err_oct32)


def test_self_occlusion_fraction_separates_convex_from_occluded():
    """The auto fastpath gate's static probe: a convex sphere scores ~0
    (below the 1% datamodule threshold), geometry with real self-shadowing
    scores well above it."""
    m = mesh_lib.make_icosphere(2)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    baked = vis_lib.bake_vertex_visibility(bvh, m.v_pos, m.v_nrm, oct_res=8, eps=1e-2)
    f_sphere = vis_lib.self_occlusion_fraction(baked, m.v_nrm)
    assert f_sphere < 0.01

    # stacked spheres: the lower sphere's top hemisphere sees the upper one
    v1 = np.asarray(m.v_pos)
    f1 = np.asarray(m.t_pos_idx)
    v = np.concatenate([v1, v1 + np.asarray([0.0, 0.0, 2.5])])
    f = np.concatenate([f1, f1 + len(v1)])
    nrm = np.concatenate([np.asarray(m.v_nrm)] * 2)
    bvh2 = bvh_lib.build_bvh(v, f)
    baked2 = vis_lib.bake_vertex_visibility(
        bvh2, jnp.asarray(v), jnp.asarray(nrm), oct_res=8, eps=1e-2
    )
    f_occ = vis_lib.self_occlusion_fraction(baked2, jnp.asarray(nrm))
    assert f_occ > 0.01
    assert f_occ > 3 * max(f_sphere, 1e-6)


def test_lookup_visibility_carries_no_gradient(monkeypatch):
    """Reference parity (dreammat_material.py:490-507): visibility is a hard
    boolean ray hit — autodiff must see a constant multiplier. The bilinear
    table lookup would otherwise inject a phantom d(vis)/d(direction) term
    near horizons that the exact estimator's gradient never contains.
    (Measured: removing the term does NOT close the torus grad-cos gap —
    0.2831 -> 0.2832 — so this is a parity fix, not the gap's root cause.)
    DREAMMAT_VIS_GRAD=smooth re-enables the term for A/B."""
    from dreammat_tpu.ops.visibility import BakedVisibility, lookup_visibility

    O = 8
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((3, O * O)), jnp.float16)
    baked = BakedVisibility(table=table, oct_res=O)
    tri_verts = jnp.asarray([[0, 1, 2]], jnp.int32)
    bary = jnp.asarray([[0.3, 0.3, 0.4]])

    def loss(theta):
        # directions depend on theta like GGX samples depend on roughness
        d = jnp.stack([jnp.sin(theta), jnp.cos(theta) * 0.2,
                       jnp.cos(theta)], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.sum(lookup_visibility(baked, tri_verts, bary, d[None]))

    theta = jnp.asarray([0.3, 0.7])
    assert float(jnp.abs(jax.grad(lambda t: loss(t))(theta)).max()) == 0.0
    # the value itself is real (fractional, direction-dependent)
    v1, v2 = float(loss(theta[:1])), float(loss(theta[1:]))
    assert 0.0 < v1 < 1.0 and v1 != v2

    monkeypatch.setenv("DREAMMAT_VIS_GRAD", "smooth")
    g = jax.grad(lambda t: loss(t))(theta)
    assert float(jnp.abs(g).max()) > 1e-4  # smooth mode restores the term
