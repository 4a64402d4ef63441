"""View-static hashgrid encode (ops/hashgrid.py): the scatter-free table
backward used for fixed G-buffer query points. Must be feature- and
gradient-equivalent to the plain encode (which the reference's tcnn
HashGrid backward computes exactly, networks.py:55-64)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreammat_tpu.ops import hashgrid as hg


@pytest.mark.parametrize("D", [2, 3])
def test_static_encode_matches_plain(D):
    cfg = hg.HashGridConfig(
        n_input_dims=D, n_levels=6, log2_hashmap_size=10,
        base_resolution=4, per_level_scale=1.8,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(777, D), jnp.float32)
    table = hg.init_hashgrid(jax.random.PRNGKey(0), cfg) * 1e4  # O(1) features
    maps = hg.build_encode_maps(x, cfg)
    a = hg.hashgrid_encode(table, x, cfg)
    b = hg.hashgrid_encode_static(table, maps, cfg)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_static_grad_matches_autodiff():
    cfg = hg.HashGridConfig(
        n_levels=6, log2_hashmap_size=11, base_resolution=4, per_level_scale=1.9
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1234, 3), jnp.float32)
    table = hg.init_hashgrid(jax.random.PRNGKey(0), cfg) * 1e4
    maps = hg.build_encode_maps(x, cfg)
    # realistic cotangents (not all-ones): random signs and magnitudes
    co = jnp.asarray(rng.randn(1234, cfg.n_output_dims), jnp.float32)
    g_ref = jax.grad(lambda t: jnp.sum(hg.hashgrid_encode(t, x, cfg) * co))(table)
    g_new = jax.grad(lambda t: jnp.sum(hg.hashgrid_encode_static(t, maps, cfg) * co))(table)
    scale = float(jnp.abs(g_ref).max())
    assert float(jnp.abs(g_ref - g_new).max()) < 1e-4 * max(scale, 1.0)


def test_static_grad_duplicate_points():
    """Many points in one cell (the cumsum-cancellation stress case)."""
    cfg = hg.HashGridConfig(
        n_levels=4, log2_hashmap_size=8, base_resolution=4, per_level_scale=1.5
    )
    rng = np.random.RandomState(2)
    # cluster everything into a tiny region -> long same-cell segments
    x = jnp.asarray(0.5 + 0.01 * rng.rand(4096, 3), jnp.float32)
    table = hg.init_hashgrid(jax.random.PRNGKey(0), cfg)
    maps = hg.build_encode_maps(x, cfg)
    co = jnp.asarray(rng.randn(4096, cfg.n_output_dims), jnp.float32)
    g_ref = jax.grad(lambda t: jnp.sum(hg.hashgrid_encode(t, x, cfg) * co))(table)
    g_new = jax.grad(lambda t: jnp.sum(hg.hashgrid_encode_static(t, maps, cfg) * co))(table)
    scale = float(jnp.abs(g_ref).max())
    assert float(jnp.abs(g_ref - g_new).max()) < 2e-4 * max(scale, 1.0)


def test_shade_view_static_maps_match():
    """Renderer integration: shade_view with enc_maps reproduces the plain
    path's forward bit-for-bit on the MAIN query (the jitter query uses the
    view-fixed draw, so only the smoothness-reg term may differ)."""
    import dreammat_tpu
    import dreammat_tpu.models  # registry
    from dreammat_tpu.data.cameras import make_fixed_cameras, camera_rays_and_matrices
    from dreammat_tpu.models.mesh import make_icosphere

    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": None,  # set_mesh below provides the surface
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
                "log2_hashmap_size": 10, "base_resolution": 4, "per_level_scale": 1.7,
            },
        }
    )
    geo.set_mesh(make_icosphere(2))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent", "n_environments": 1,
            "env_height": 16, "env_width": 32,
            "diffuse_sample_num": 8, "specular_sample_num": 8,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    cam = make_fixed_cameras(1, seed=3)
    cd = camera_rays_and_matrices(cam, 0, 48, 48)
    gb = ren.build_gbuffer(cd["rays_o"], cd["rays_d"], cd["w2c"])
    params = geo.init(jax.random.PRNGKey(0))
    maps = ren.build_enc_maps(gb, jax.random.PRNGKey(5))
    assert maps is not None

    k = jax.random.PRNGKey(9)
    out_plain = ren.shade_view(params, gb, jnp.int32(0), k, is_train=True)
    out_static = ren.shade_view(params, gb, jnp.int32(0), k, is_train=True, enc_maps=maps)
    assert np.allclose(
        np.asarray(out_plain["comp_rgb"]), np.asarray(out_static["comp_rgb"]), atol=1e-5
    )
    # gradients through the static path are finite and move the table
    def loss(p, m):
        o = ren.shade_view(p, gb, jnp.int32(0), k, is_train=True, enc_maps=m)
        return jnp.mean(o["comp_rgb"]) + o["loss_mat_reg"]

    g = jax.grad(loss)(params, maps)
    gmax = float(jnp.abs(g["table"]).max())
    assert 0 < gmax < 1e6  # nonzero and bounded (subsumes finite)
