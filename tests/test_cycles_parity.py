"""Cycles-parity harness machinery (VERDICT r1 #3 / SURVEY hard part #2).

No Blender exists in the image, so these tests validate every link the
real comparison will use: the reference PNG cache writer/loader roundtrip
(including the reference's raw-mm-depth + load-time inverse normalization,
uncond.py:539-556), the residual table, and the frozen-ControlNet response
delta — with the exact-MC probe stack standing in for Cycles."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dreammat_tpu
import dreammat_tpu.models  # registry
from dreammat_tpu.data import prerender as pre
from dreammat_tpu.data.cameras import make_fixed_cameras
from dreammat_tpu.models.mesh import make_icosphere

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import cycles_parity as cp  # noqa: E402


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
            "environment_texture": "/nonexistent", "n_environments": 2,
            "env_height": 16, "env_width": 32,
            "diffuse_sample_num": 64, "specular_sample_num": 64,
            "use_prefiltered": True,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    cam = make_fixed_cameras(2, seed=1)
    return geo, mat, ren, cam


def test_png_cache_roundtrip(tmp_path, rig):
    """write_reference_png_cache -> load_reference_png_cache reproduces the
    stack up to 8-bit quantization; depth goes through the reference's raw
    mm + inverse-normalize transform."""
    rng = np.random.RandomState(0)
    Nv, E, H = 2, 2, 32
    lightmaps = rng.rand(Nv, E, H, H, 18).astype(np.float32)
    raw_depth = np.zeros((Nv, H, H), np.float32)
    raw_depth[:, 8:24, 8:24] = 3.0 + rng.rand(Nv, 16, 16)
    normals = rng.rand(Nv, H, H, 3).astype(np.float32)

    pre.write_reference_png_cache(str(tmp_path), lightmaps, raw_depth, normals)
    lm, d, n = pre.load_reference_png_cache(str(tmp_path), Nv, E, H, H)
    assert np.abs(lm.astype(np.float32) - lightmaps).max() < 1 / 255 + 1e-3
    assert np.abs(n.astype(np.float32) - normals).max() < 1 / 255 + 1e-3
    # loaded depth equals the inverse-normalized raw depth
    expect = np.stack([pre._inverse_normalize_depth(raw_depth[i]) for i in range(Nv)])
    assert np.abs(d[..., 0].astype(np.float32) - expect).max() < 2e-3


def test_parity_residuals_and_controlnet_delta(rig, tmp_path):
    """End-to-end harness at tiny scale: fast-path stack vs exact-MC stack
    roundtripped through the PNG layout. Residuals must be small for a
    convex sphere; the frozen-ControlNet response delta must be finite and
    bounded (the number the real-weights comparison will report)."""
    geo, mat, ren, cam = rig
    E, res = 2, 32
    data, ours, raw = cp.our_stack(ren, mat, cam, E, res, res)
    ref = cp.mc_reference_stack(ren, mat, cam, E, res, res, str(tmp_path / "cache"))
    assert ours.shape == ref.shape == (2, E, res, res, 22)

    table = cp.residual_table(ours, ref)
    # depth/normal are shared machinery on both sides -> near exact
    assert table["depth"]["mae"] < 0.02, table["depth"]
    assert table["normal"]["mae"] < 0.02, table["normal"]
    # probes: conv bake vs MC on a convex sphere
    for g in ("probe_m0r0", "probe_m0r1", "probe_m1r.5"):
        assert table[g]["rmse"] < 0.12, (g, table[g])

    cn = cp.controlnet_delta(ours, ref)
    # relative L2 is non-negative by construction; small on a smooth mesh
    assert 0.0 <= cn["rel_l2_mean"] < 0.5, cn


def test_exact_probe_renderer_matches_mc_on_sphere(rig):
    """render_probes_for_view_exact (per-ray BVH visibility, the harness's
    ground truth) agrees with render_probes_for_view_mc (per-pixel MC with
    baked per-vertex visibility) on a convex sphere, where baked visibility
    is exact — pinning exact-vs-MC estimator agreement when the visibility
    term cancels. Also pins shape/NaN-freeness of the exact path. (The
    octahedral conv-bake fast path is compared separately via
    tools/quantify_fastpath.py / the residual-table test above.)"""
    from dreammat_tpu.data.cameras import camera_rays_and_matrices

    geo, mat, ren, cam = rig
    cd = camera_rays_and_matrices(cam, 0, 32, 32)
    gb = ren.build_gbuffer(cd["rays_o"], cd["rays_d"], cd["w2c"])
    mat.set_raytracer(ren.trace)
    ex = np.asarray(pre.render_probes_for_view_exact(
        ren, mat, gb, 2, jax.random.PRNGKey(0), chunk=256))
    mc, _ = pre.render_probes_for_view_mc(ren, mat, gb, 2, jax.random.PRNGKey(0))
    mc = np.asarray(mc)
    assert ex.shape == (2, 32, 32, 18)
    assert not np.isnan(ex).any()
    fg = np.asarray(gb.mask)
    d = np.abs(ex - mc)[:, fg]
    assert d.mean() < 0.05, d.mean()
    # background must be black on every probe channel
    assert np.abs(ex[:, ~fg]).max() == 0.0
