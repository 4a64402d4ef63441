import jax
import jax.numpy as jnp
import numpy as np

from dreammat_tpu.models import mesh as mesh_lib
from dreammat_tpu.ops import bvh as bvh_lib


def _random_rays(rng, n, radius=3.0):
    """Rays from random points on a sphere of `radius` toward random targets near origin."""
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * radius
    target = rng.normal(size=(n, 3)) * 0.3
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, dtype=jnp.float32), jnp.asarray(d, dtype=jnp.float32)


def test_bvh_matches_bruteforce_sphere():
    m = mesh_lib.make_icosphere(subdiv=2)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    rng = np.random.RandomState(0)
    o, d = _random_rays(rng, 512)
    got = bvh_lib.cast_rays(bvh, o, d)
    ref = bvh_lib.cast_rays_bruteforce(m.v_pos, m.t_pos_idx, o, d)
    assert np.array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    assert np.allclose(np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], atol=1e-4)
    # faces may differ only when two triangles are hit at ~equal t; depth must agree
    assert hit.mean() > 0.9  # rays aimed at the sphere mostly hit


def test_bvh_matches_bruteforce_box():
    m = mesh_lib.make_box(0.5)
    # box has 12 triangles > 8 like reference requires; pad not needed
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    rng = np.random.RandomState(1)
    o, d = _random_rays(rng, 256, radius=4.0)
    got = bvh_lib.cast_rays(bvh, o, d)
    ref = bvh_lib.cast_rays_bruteforce(m.v_pos, m.t_pos_idx, o, d)
    assert np.array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    assert np.allclose(np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], atol=1e-4)


def test_bvh_miss_depth_semantics():
    m = mesh_lib.make_icosphere(subdiv=1)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    # rays pointing away from the mesh
    o = jnp.asarray([[3.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = bvh_lib.cast_rays(bvh, o, d)
    assert not bool(out["hit"][0]) and not bool(out["hit"][1])
    # miss => depth >= 10 (reference raytracing_renderer.py:322)
    assert float(out["t"][0]) >= 10.0


def test_bvh_barycentric_position():
    m = mesh_lib.make_icosphere(subdiv=2)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    rng = np.random.RandomState(2)
    o, d = _random_rays(rng, 128)
    out = bvh_lib.cast_rays(bvh, o, d)
    hit = np.asarray(out["hit"])
    f = np.asarray(out["face"])[hit]
    u = np.asarray(out["u"])[hit][:, None]
    v = np.asarray(out["v"])[hit][:, None]
    tris = np.asarray(m.t_pos_idx)[f]
    vp = np.asarray(m.v_pos)
    p_bary = (1 - u - v) * vp[tris[:, 0]] + u * vp[tris[:, 1]] + v * vp[tris[:, 2]]
    p_ray = np.asarray(o)[hit] + np.asarray(out["t"])[hit][:, None] * np.asarray(d)[hit]
    assert np.allclose(p_bary, p_ray, atol=1e-3)
    # all hit points lie on the unit sphere
    assert np.allclose(np.linalg.norm(p_bary, axis=-1), 1.0, atol=0.05)


def test_chunked_equals_unchunked():
    m = mesh_lib.make_icosphere(subdiv=1)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    rng = np.random.RandomState(3)
    o, d = _random_rays(rng, 300)
    a = bvh_lib.cast_rays(bvh, o, d)
    b = bvh_lib.cast_rays_chunked(bvh, o, d, chunk=128)
    for k in a:
        assert np.allclose(np.asarray(a[k]), np.asarray(b[k]), atol=1e-6), k


def test_mesh_loaders_obj(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
        "f 1/1 2/2 3/3\nf 2/2 4/4 3/3\n"
    )
    v, f, vt, ft = mesh_lib.load_obj(str(p))
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert vt.shape == (4, 2) and ft.shape == (2, 3)
    # exact values (OBJ is 1-indexed; loader must return 0-indexed faces)
    assert np.allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]])
    assert np.array_equal(np.asarray(f), [[0, 1, 2], [1, 3, 2]])
    assert np.allclose(vt, [[0, 0], [1, 0], [0, 1], [1, 1]])
    assert np.array_equal(np.asarray(ft), [[0, 1, 2], [1, 3, 2]])


def test_load_mesh_normalization(tmp_path):
    p = tmp_path / "m.obj"
    # offset cube-ish tetrahedron
    p.write_text(
        "v 10 10 10\nv 12 10 10\nv 10 12 10\nv 10 10 12\n"
        "f 1 2 3\nf 1 2 4\nf 1 3 4\nf 2 3 4\n"
    )
    m = mesh_lib.load_mesh(str(p), scale=0.8)
    v = np.asarray(m.v_pos)
    assert abs(np.abs(v).max() - 0.8) < 1e-5
    assert np.allclose(v.mean(0), 0.0, atol=0.5)


def test_vertex_normals_sphere():
    m = mesh_lib.make_icosphere(subdiv=3)
    vn = np.asarray(m.v_nrm)
    vp = np.asarray(m.v_pos)
    # on a sphere, vertex normal ~ position direction
    cos = (vn * vp).sum(-1) / np.linalg.norm(vp, axis=-1)
    assert cos.min() > 0.99


def test_plane_caster_matches_bruteforce():
    """cast_rays_plane (plane/edge-equation scan, the MXU-friendly default
    for small/medium meshes) vs exact Möller–Trumbore brute force."""
    for subdiv in (1, 2):
        m = mesh_lib.make_icosphere(subdiv=subdiv)
        bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
        rng = np.random.RandomState(subdiv)
        o, d = _random_rays(rng, 700)
        got = bvh_lib.cast_rays_plane(bvh, o, d)
        ref = bvh_lib.cast_rays_bruteforce(m.v_pos, m.t_pos_idx, o, d)
        assert np.array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
        hit = np.asarray(ref["hit"])
        assert np.allclose(np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], atol=1e-4)
        # barycentric hit positions must agree even where face ids tie
        def pos(out):
            f = np.maximum(np.asarray(out["face"]), 0)
            tri = np.asarray(m.t_pos_idx)[f]
            vp = np.asarray(m.v_pos)
            u = np.asarray(out["u"])[:, None]
            v = np.asarray(out["v"])[:, None]
            return (1 - u - v) * vp[tri[:, 0]] + u * vp[tri[:, 1]] + v * vp[tri[:, 2]]
        assert np.allclose(pos(got)[hit], pos(ref)[hit], atol=2e-3)


def test_plane_caster_t_max_and_miss():
    m = mesh_lib.make_icosphere(subdiv=1)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    o = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])  # hit, miss
    out = bvh_lib.cast_rays_plane(bvh, o, d)
    assert bool(out["hit"][0]) and not bool(out["hit"][1])
    assert float(out["t"][1]) == bvh_lib.MISS_DEPTH
    # t_max short enough that the hit is rejected
    out2 = bvh_lib.cast_rays_plane(bvh, o, d, t_max=1.0)
    assert not bool(out2["hit"][0])


def test_dense_pallas_matches_bruteforce():
    """Pallas tiled caster (interpret mode on CPU = exact kernel logic)."""
    m = mesh_lib.make_icosphere(subdiv=2)
    bvh = bvh_lib.build_bvh(np.asarray(m.v_pos), np.asarray(m.t_pos_idx))
    rng = np.random.RandomState(4)
    o, d = _random_rays(rng, 600)
    got = bvh_lib.cast_rays_dense_pallas(bvh, o, d, block_r=128, block_t=128,
                                         interpret=True)
    ref = bvh_lib.cast_rays_bruteforce(m.v_pos, m.t_pos_idx, o, d)
    assert np.array_equal(np.asarray(got["hit"]), np.asarray(ref["hit"]))
    hit = np.asarray(ref["hit"])
    assert np.allclose(np.asarray(got["t"])[hit], np.asarray(ref["t"])[hit], atol=1e-4)
    def pos(out):
        f = np.maximum(np.asarray(out["face"]), 0)
        tri = np.asarray(m.t_pos_idx)[f]
        vp = np.asarray(m.v_pos)
        u = np.asarray(out["u"])[:, None]
        v = np.asarray(out["v"])[:, None]
        return (1 - u - v) * vp[tri[:, 0]] + u * vp[tri[:, 1]] + v * vp[tri[:, 2]]
    assert np.allclose(pos(got)[hit], pos(ref)[hit], atol=2e-3)


def test_fix_winding_outward():
    """Inside-out closed meshes are flipped at load; open sheets and
    correct meshes are untouched (the inverted-torus bug: ROADMAP #44)."""
    m = mesh_lib.make_icosphere(subdiv=1)
    v = np.asarray(m.v_pos, np.float64)
    f = np.asarray(m.t_pos_idx)
    # correct winding: unchanged
    f_ok = mesh_lib.fix_winding_outward(v, f)
    assert np.array_equal(f_ok, f)
    # inverted winding: flipped back, and the repaired normals agree with
    # the radial direction again
    f_in = f[:, [0, 2, 1]]
    f_fix = mesh_lib.fix_winding_outward(v, f_in)
    assert np.array_equal(np.sort(f_fix, axis=1), np.sort(f_in, axis=1))
    vn = mesh_lib.compute_vertex_normals(v.astype(np.float32), f_fix)
    cos = (vn * v).sum(-1) / np.linalg.norm(v, axis=-1)
    assert cos.min() > 0.9
    # open sheet (zero signed volume): left alone even with "inward" z
    vs = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    fs = np.asarray([[0, 2, 1]])
    assert np.array_equal(mesh_lib.fix_winding_outward(vs, fs), fs)


def test_load_mesh_flips_inverted_obj(tmp_path):
    p = tmp_path / "inv.obj"
    # tetrahedron with all faces wound INWARD
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "f 1 2 3\nf 1 4 2\nf 1 3 4\nf 2 4 3\n"
    )
    m = mesh_lib.load_mesh(str(p), scale=0.8)
    v = np.asarray(m.v_pos, np.float64)
    w = v[np.asarray(m.t_pos_idx)]
    assert np.sum(np.linalg.det(w)) > 0  # outward after load
