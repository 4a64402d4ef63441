"""Per-pixel visibility-aware split-sum tables vs the exact MC estimator.

The prefiltered path is an approximation (Karis split-sum factorization),
so the test checks: exact agreement of the diffuse term, bounded error of
the full color for moderate roughness, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.models  # registry
from dreammat_tpu.data import prerender as pre
from dreammat_tpu.data.cameras import camera_rays_and_matrices, make_fixed_cameras
from dreammat_tpu.models.mesh import make_icosphere


@pytest.fixture(scope="module")
def rig():
    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(2))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent", "n_environments": 1,
            "env_height": 32, "env_width": 64,
            "diffuse_sample_num": 64, "specular_sample_num": 64,
            "use_prefiltered": True,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    cam = make_fixed_cameras(1)
    cd = camera_rays_and_matrices(cam, 0, 32, 32)
    gb = ren.build_gbuffer(cd["rays_o"], cd["rays_d"], cd["w2c"])
    _, tabs = pre.render_probes_for_view(ren, mat, gb, 1, cd["camera_position"])
    # tabs is the per-VERTEX table [E, V, 1+K, 3]
    return geo, mat, ren, gb, jnp.asarray(tabs[0], dtype=jnp.float32)


def _mats(P, metallic, rough_sq, albedo=0.6):
    return (
        jnp.full((P, 1), metallic),
        jnp.full((P, 1), rough_sq),
        jnp.full((P, 3), albedo),
    )


def test_diffuse_term_matches_mc(rig):
    geo, mat, ren, gb, table = rig
    P = gb.fg_pos.shape[0]
    m, r, a = _mats(P, 0.0, 0.5)
    pf = mat.shade_prefiltered(gb.fg_normal, gb.fg_viewdir, m, r, a, table,
                               vis_data=(gb.fg_tri, gb.fg_bary))
    mc = mat.shade_raytracing(
        gb.fg_pos, gb.fg_normal, gb.fg_viewdir, jnp.int32(0), m, r, a,
        jax.random.PRNGKey(1), is_train=False, mask=gb.fg_valid,
        vis_data=(gb.fg_tri, gb.fg_bary),
    )
    valid = np.asarray(gb.fg_valid)
    # the diffuse irradiance is baked per-VERTEX and barycentric-mixed, vs the
    # MC path's per-pixel interpolated-normal frame: small smooth deviation
    d_pf = np.asarray(pf["diffuse_color"])[valid]
    d_mc = np.asarray(mc["diffuse_color"])[valid]
    assert np.abs(d_pf - d_mc).mean() < 0.03, np.abs(d_pf - d_mc).mean()


@pytest.mark.parametrize("metallic,rough_sq", [(0.0, 0.3), (0.9, 0.5), (0.5, 0.1)])
def test_full_color_close_to_mc(rig, metallic, rough_sq):
    geo, mat, ren, gb, table = rig
    P = gb.fg_pos.shape[0]
    m, r, a = _mats(P, metallic, rough_sq)
    pf = mat.shade_prefiltered(gb.fg_normal, gb.fg_viewdir, m, r, a, table,
                               vis_data=(gb.fg_tri, gb.fg_bary))
    mc = mat.shade_raytracing(
        gb.fg_pos, gb.fg_normal, gb.fg_viewdir, jnp.int32(0), m, r, a,
        jax.random.PRNGKey(1), is_train=False, mask=gb.fg_valid,
        vis_data=(gb.fg_tri, gb.fg_bary),
    )
    valid = np.asarray(gb.fg_valid)
    c_pf = np.asarray(pf["color"])[valid]
    c_mc = np.asarray(mc["color"])[valid]
    # split-sum factorization error grows with metallic (fresnel-light
    # correlation) — same character as the reference's own splitsum branch;
    # exact MC stays available via use_prefiltered=false
    tol = 0.12 if metallic > 0.5 else 0.08
    err = np.abs(c_pf - c_mc).mean()
    assert err < tol, err


def test_prefiltered_grads_flow(rig):
    geo, mat, ren, gb, table = rig
    P = gb.fg_pos.shape[0]

    def loss(feats):
        out, _ = mat(
            gb.fg_pos, feats, feats, gb.fg_viewdir, gb.fg_normal,
            jnp.int32(0), jax.random.PRNGKey(0), is_train=True,
            mask=gb.fg_valid, vis_data=(gb.fg_tri, gb.fg_bary),
            light_table=table,
        )
        return jnp.sum(out["color"])

    g = jax.grad(loss)(jnp.zeros((P, 5)))
    arr = np.asarray(g)
    assert np.abs(arr).max() < 1e4  # bounded subsumes finite
    # gradient reaches albedo, metallic AND roughness channels
    assert np.abs(arr[:, :3]).sum() > 0
    assert np.abs(arr[:, 3]).sum() > 0
    assert np.abs(arr[:, 4]).sum() > 0


def test_shade_view_uses_table(rig):
    geo, mat, ren, gb, table = rig
    params = geo.init(jax.random.PRNGKey(0))
    out = ren.shade_view(params, gb, jnp.int32(0), jax.random.PRNGKey(1), light_table=table)
    rgb = np.asarray(out["comp_rgb"])
    # lin2srgb colors over a solid background: non-negative and bounded
    assert rgb.min() >= 0.0 and rgb.max() < 1e4
