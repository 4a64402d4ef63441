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
