"""Octahedral-convolution prerender bakes vs their sampled counterparts.

The round-2 prerender replaces per-pixel sampled-radiance gathers with
per-vertex quadrature over the octahedral visibility bins
(ops/visibility.bake_vertex_{irradiance,specular}_conv). These tests pin:
quadrature weights integrate to 4pi, the conv irradiance matches the
fibonacci-sampled bake, the conv specular prefilter matches a brute-force
importance-sampled prefilter, and the fast probe pass stays close to the
retired per-pixel Monte-Carlo pass (render_probes_for_view_mc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.models  # registry
from dreammat_tpu.data import prerender as pre
from dreammat_tpu.data.cameras import camera_rays_and_matrices, make_fixed_cameras
from dreammat_tpu.models.mesh import make_icosphere
from dreammat_tpu.ops import visibility as vis
from dreammat_tpu.utils import ops as uops


def test_oct_bin_solid_angles_sum_to_sphere():
    for oct_res in (8, 16, 32):
        dirs, sa = vis.oct_bin_geometry(oct_res)
        assert dirs.shape == (oct_res * oct_res, 3)
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(sa.sum(), 4 * np.pi, rtol=1e-6)
        assert (sa > 0).all()


def test_oct_bin_dirs_match_bin_order():
    # bin centers must land in their own dir_to_bin bin
    dirs, _ = vis.oct_bin_geometry(16)
    bins = np.asarray(vis.dir_to_bin(jnp.asarray(dirs), 16))
    np.testing.assert_array_equal(bins, np.arange(256))


@pytest.fixture(scope="module")
def sphere_rig():
    mesh = make_icosphere(3)
    from dreammat_tpu.ops import bvh as bvh_lib

    bvh = bvh_lib.build_bvh(np.asarray(mesh.v_pos), np.asarray(mesh.t_pos_idx))
    baked = vis.bake_vertex_visibility(bvh, mesh.v_pos, mesh.v_nrm, oct_res=16)
    from dreammat_tpu.ops import envmap as envmap_lib

    env = envmap_lib.make_procedural_envmap(32, 64, sun_dir=np.array([0.3, 0.5, 0.8]))
    lvis = vis.bake_shadowed_radiance(baked, jnp.asarray(env)[None])
    return mesh, baked, lvis


def test_conv_irradiance_matches_quadrature(sphere_rig):
    """The conv bake must reproduce the exact cosine quadrature of the
    BINNED radiance: E/pi = sum_b L_b * (integral_bin cos domega)/pi, with
    the per-bin cosine mass computed by dense Monte Carlo. (The round-1
    fibonacci-sampled bake has high variance on peaked radiance — ~4 samples
    land in the dominant bin — which is exactly why it was replaced.)"""
    mesh, baked, lvis = sphere_rig
    oct_res = 16
    e_conv = np.asarray(vis.bake_vertex_irradiance_conv(lvis, mesh.v_nrm, oct_res))

    rng = np.random.RandomState(0)
    d = rng.randn(200000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bins = np.asarray(vis.dir_to_bin(jnp.asarray(d, dtype=jnp.float32), oct_res))
    lv = np.asarray(lvis, dtype=np.float32)  # [V,O2,3]
    for vi in [0, 7, 100]:
        n = np.asarray(mesh.v_nrm)[vi]
        cos = np.maximum(d @ n, 0.0)
        mass = np.zeros(oct_res * oct_res)
        np.add.at(mass, bins, cos)
        mass *= 4.0 / len(d)  # (4pi/N) sum cos / pi
        gt = (lv[vi] * mass[:, None]).sum(0)
        got = e_conv[0, vi]
        assert np.abs(got - gt).mean() / max(gt.mean(), 1e-6) < 0.04, (vi, got, gt)


def test_conv_specular_matches_importance_sampled(sphere_rig):
    mesh, baked, lvis = sphere_rig
    oct_res = 16
    V = mesh.v_pos.shape[0]
    key = jax.random.PRNGKey(0)
    refl = uops.safe_normalize(jax.random.normal(key, (V, 3)))
    alphas = (0.25, 1.0)
    s_conv = np.asarray(vis.bake_vertex_specular_conv(lvis, refl, alphas, oct_res))

    # brute-force UE4-style prefilter: GGX HALF-VECTOR importance sampling
    # about each reflection dir (N=V=R), reflect to get light dirs,
    # NoL-weighted average of the binned shadowed radiance. This is the
    # split-sum prefilter the FG LUT pairs with.
    n = 4096
    u1 = (np.arange(n) + 0.5) / n
    rng = np.random.RandomState(1)
    u2 = rng.rand(n)
    for k, alpha in enumerate(alphas):
        phi = 2 * np.pi * u2
        # alpha plays "roughness_sq"; the NDF uses a2 = alpha^2 like
        # distribution_ggx / sample_specular_directions
        cos_h = np.sqrt((1 - u1) / (1 + (alpha**2 - 1) * u1))
        sin_h = np.sqrt(np.maximum(1 - cos_h**2, 0))
        r = np.asarray(refl)
        x = np.asarray(uops.get_orthogonal_directions(refl))
        y = np.cross(r, x)
        h = (
            (np.cos(phi)[None, :, None] * sin_h[None, :, None]) * x[:, None]
            + (np.sin(phi)[None, :, None] * sin_h[None, :, None]) * y[:, None]
            + cos_h[None, :, None] * r[:, None]
        )  # [V,n,3] half vectors about R (= N = V)
        dirs = 2.0 * (h * r[:, None]).sum(-1, keepdims=True) * h - r[:, None]
        NoL = np.maximum((dirs * r[:, None]).sum(-1), 0.0)
        bins = np.asarray(vis.dir_to_bin(jnp.asarray(dirs), oct_res))
        lv = np.asarray(lvis, dtype=np.float32)  # [V,O2,3]
        rad = np.take_along_axis(lv, bins[..., None], axis=1)  # [V,n,3]
        s_mc = (rad * NoL[..., None]).sum(1) / (NoL.sum(1)[:, None] + 1e-8)
        err = np.abs(s_conv[:, k, 0] - s_mc).mean() / max(s_mc.mean(), 1e-6)
        assert err < 0.05, (alpha, err)


def test_conv_probes_close_to_mc_probes():
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
            "environment_texture": "/nonexistent", "n_environments": 2,
            "env_height": 32, "env_width": 64,
            "diffuse_sample_num": 128, "specular_sample_num": 128,
            "use_prefiltered": True,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    cam = make_fixed_cameras(1)
    cd = camera_rays_and_matrices(cam, 0, 48, 48)
    gb = ren.build_gbuffer(cd["rays_o"], cd["rays_d"], cd["w2c"])

    probes_conv, tabs_conv = pre.render_probes_for_view(
        ren, mat, gb, 2, cd["camera_position"]
    )
    probes_mc, tabs_mc = pre.render_probes_for_view_mc(
        ren, mat, gb, 2, jax.random.PRNGKey(0), chunk=512
    )
    pc = np.asarray(probes_conv)
    pm = np.asarray(probes_mc)
    assert pc.shape == pm.shape == (2, 48, 48, 18)
    mask = np.asarray(gb.mask)
    # sRGB-domain mean residual on foreground pixels; the two passes use
    # different specular factorizations (FG-LUT split-sum vs per-pixel
    # weighted sum) so agreement is approximate
    err = np.abs(pc[:, mask] - pm[:, mask]).mean()
    assert err < 0.06, err
    # tables: conv returns per-VERTEX rows [E,V,1+K,3]; the per-pixel rows
    # the MC pass returns are their barycentric mixes
    tm = np.asarray(tabs_mc, dtype=np.float32)   # [E,P,1+K,3]
    tv = np.asarray(tabs_conv, dtype=np.float32)  # [E,V,1+K,3]
    tri = np.asarray(gb.fg_tri)
    bary = np.asarray(gb.fg_bary)
    tc = (
        bary[None, :, 0, None, None] * tv[:, tri[:, 0]]
        + bary[None, :, 1, None, None] * tv[:, tri[:, 1]]
        + bary[None, :, 2, None, None] * tv[:, tri[:, 2]]
    )
    assert tc.shape == tm.shape
    # the MC pass bakes diffuse with the 128-sample fibonacci gather (has
    # per-bin sampling noise on peaked envs); the conv pass is the exact
    # quadrature of the same binned radiance
    d_err = np.abs(tc[:, :, 0] - tm[:, :, 0]).mean()
    assert d_err < 3e-2, d_err
    s_err = np.abs(tc[:, :, 1:] - tm[:, :, 1:]).mean() / max(tm[:, :, 1:].mean(), 1e-6)
    assert s_err < 0.15, s_err
