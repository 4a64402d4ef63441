import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
from dreammat_tpu.models.mesh import make_icosphere
from dreammat_tpu.utils import ops as uops


@pytest.fixture(scope="module")
def rig():
    import dreammat_tpu.models  # register

    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
                "log2_hashmap_size": 10, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(2))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent",
            "n_environments": 2,
            "env_height": 16,
            "env_width": 32,
            "diffuse_sample_num": 16,
            "specular_sample_num": 8,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    params = geo.init(jax.random.PRNGKey(0))

    H = W = 32
    pos = uops.camera_position_from_spherical(20.0, 30.0, 3.0)
    c2w = uops.get_c2w(pos[None])
    proj = uops.get_projection_matrix(jnp.deg2rad(jnp.array([40.0])), 1.0, 0.1, 1000.0)
    _, w2c = uops.get_mvp_matrix(c2w, proj)
    focal = 0.5 * H / np.tan(0.5 * np.deg2rad(40.0))
    dirs = uops.get_ray_directions(H, W, focal=float(focal))
    rays_o, rays_d = uops.get_rays(dirs, c2w[0], keepdim=True)
    gb = ren.build_gbuffer(rays_o, rays_d, w2c[0])
    return geo, mat, ren, params, gb, (H, W)


def test_gbuffer_geometry(rig):
    _, _, _, _, gb, (H, W) = rig
    mask = np.asarray(gb.mask)
    # sphere of radius 1 at distance 3, fov 40 -> subtends a decent area
    assert 0.1 < mask.mean() < 0.9
    # center pixel hits
    assert mask[H // 2, W // 2]
    # hit positions on unit sphere
    pos = np.asarray(gb.fg_pos)[np.asarray(gb.fg_valid)]
    assert np.allclose(np.linalg.norm(pos, axis=-1), 1.0, atol=0.05)
    # shading normals point outward
    nrm = np.asarray(gb.fg_normal)[np.asarray(gb.fg_valid)]
    cos = (nrm * pos).sum(-1) / np.linalg.norm(pos, axis=-1)
    assert cos.min() > 0.9


def test_gbuffer_condition_maps(rig):
    _, _, _, _, gb, _ = rig
    cn = np.asarray(gb.cn_normal)
    mask = np.asarray(gb.mask)
    # background is (0.5, 0.5, 1.0)
    assert np.allclose(cn[~mask], [0.5, 0.5, 1.0], atol=1e-5)
    # foreground normals in [0,1]
    assert cn[mask].min() >= 0.0 and cn[mask].max() <= 1.0
    # facing the camera, view-space z ~ +1 somewhere
    assert cn[mask][:, 2].max() > 0.8
    d = np.asarray(gb.cn_depth)[..., 0]
    assert np.allclose(d[~mask], 0.0)
    assert d[mask].min() >= 0.3 - 1e-4 and d[mask].max() <= 1.0 + 1e-4


def test_shade_view_outputs(rig):
    geo, mat, ren, params, gb, (H, W) = rig
    out = ren.shade_view(params, gb, jnp.int32(0), jax.random.PRNGKey(1))
    assert out["comp_rgb"].shape == (H, W, 3)
    for k, v in out.items():
        # bounded buffers (subsumes finite: NaN fails the comparison)
        assert float(np.abs(np.asarray(v)).max()) < 1e4, k
    # background is white — except the 1-px antialias ring around the
    # silhouette (renderer._edge_blend), so test pixels with no foreground
    # anywhere in their 3x3 neighborhood
    mask = np.asarray(gb.mask)
    pad = np.pad(mask, 1)
    near_fg = np.zeros_like(mask)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            near_fg |= pad[1 + dy : 1 + dy + mask.shape[0],
                           1 + dx : 1 + dx + mask.shape[1]]
    far_bg = (~mask) & (~near_fg)
    assert np.allclose(np.asarray(out["comp_rgb"])[far_bg], 1.0, atol=1e-5)


def test_shade_view_grad(rig):
    geo, mat, ren, params, gb, _ = rig

    def loss(p):
        out = ren.shade_view(p, gb, jnp.int32(0), jax.random.PRNGKey(1))
        return jnp.mean(out["comp_rgb"]) + out["loss_mat_reg"]

    g = jax.grad(loss)(params)
    total = float(jnp.abs(g["table"]).sum()) + sum(
        float(jnp.abs(w).sum()) for w in g["mlp"]["w"]
    )
    assert 0 < total < 1e6  # nonzero and bounded (subsumes finite)


def test_shade_view_jits(rig):
    geo, mat, ren, params, gb, _ = rig
    f = jax.jit(lambda p, g, e, r: ren.shade_view(p, g, e, r)["comp_rgb"])
    a = f(params, gb, jnp.int32(0), jax.random.PRNGKey(1))
    b = ren.shade_view(params, gb, jnp.int32(0), jax.random.PRNGKey(1))["comp_rgb"]
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_trace_matches_reference_semantics(rig):
    _, _, ren, _, _, _ = rig
    o = jnp.asarray([[3.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    pos, nrm, depth, hit = ren.trace(o, d)
    assert bool(hit[0]) and not bool(hit[1])
    assert abs(float(depth[0, 0]) - 2.0) < 0.05  # sphere radius 1 at distance 3
    assert float(depth[1, 0]) >= 10.0  # miss depth semantics


def test_edge_blend_antialias():
    """Silhouette pixels become fractional coverage; interior stays exact
    (reference: nvdiffrast antialias on comp_rgb/normal,
    raytracing_renderer.py:201)."""
    import jax.numpy as jnp

    from dreammat_tpu.models.renderer import _edge_blend

    H = 8
    mask = np.zeros((H, H), np.float32)
    mask[2:6, 2:6] = 1.0
    img = np.zeros((H, H, 3), np.float32)
    img[2:6, 2:6] = 0.2  # dark square on white bg
    out = np.asarray(_edge_blend(jnp.asarray(img), jnp.asarray(mask), jnp.ones(3)))
    # interior pixel exact
    assert np.allclose(out[3, 3], 0.2)
    # far background exact
    assert np.allclose(out[0, 0], 1.0)
    # one-pixel ring outside the mask is a blend strictly between fg and bg
    ring = out[1, 3, 0]
    assert 0.2 < ring < 1.0
    # binary-mask hard edge is gone: the transition spans >= 2 intensity steps
    col = out[:, 3, 0]
    assert len(np.unique(np.round(col, 3))) >= 3
