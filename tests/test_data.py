import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.data  # registry
import dreammat_tpu.models  # registry
from dreammat_tpu.data import cameras as cam_lib
from dreammat_tpu.models.mesh import make_icosphere


def test_fixed_cameras_ranges():
    cam = cam_lib.make_fixed_cameras(16, seed=3)
    assert len(cam) == 16
    assert (cam.elevation_deg >= -20).all() and (cam.elevation_deg <= 45).all()
    assert (cam.azimuth_deg >= -180).all() and (cam.azimuth_deg <= 180).all()
    assert (cam.camera_distances >= 3.0).all() and (cam.camera_distances <= 4.0).all()
    # stratified azimuths: sorted bins cover the range
    az = np.sort(cam.azimuth_deg)
    assert az[0] < -140 and az[-1] > 140


def test_eval_cameras_circle():
    cam = cam_lib.make_eval_cameras(8, elevation_deg=15.0)
    assert len(cam) == 8
    assert np.allclose(cam.elevation_deg, 15.0)
    assert len(np.unique(np.round(cam.azimuth_deg, 3))) == 8


@pytest.fixture(scope="module")
def dm():
    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(1))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent", "n_environments": 2,
            "env_height": 16, "env_width": 32,
            "diffuse_sample_num": 8, "specular_sample_num": 4,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    dm = dreammat_tpu.find("random-camera-datamodule")(
        {
            "width": 24, "height": 24, "eval_width": 24, "eval_height": 24,
            "fix_view_num": 3, "fix_env_num": 2,
            "cond_height": 24, "cond_width": 24,
            "prerender_cache_dir": None, "n_test_views": 2,
        },
        ren, mat,
    )
    dm.setup()
    return dm


def test_prerender_shapes(dm):
    d = dm.data
    assert d.lightmaps.shape == (3, 2, 24, 24, 18)
    assert d.depths.shape == (3, 24, 24, 1)
    assert d.normals.shape == (3, 24, 24, 3)
    V = dm.renderer.mesh.v_pos.shape[0]
    assert d.table_spec.shape[:3] == (3, 2, V)
    assert d.table_diff.shape == (2, V, 3)
    # probe renders and prefiltered tables are non-negative radiance with
    # a sane HDR bound (value contract, subsumes finiteness)
    lm = np.asarray(d.lightmaps, dtype=np.float32)
    ts = np.asarray(d.table_spec, dtype=np.float32)
    assert lm.min() >= 0.0 and lm.max() < 1e4
    assert ts.min() >= 0.0 and ts.max() < 1e4
    # condition-map value contracts (reference uncond.py:540-557 semantics):
    # inverse depth normalized to [0.3, 1] on hits, exactly 0 on background
    dep = np.asarray(d.depths, np.float32)
    mask = np.stack([np.asarray(g.mask) for g in d.gbuffers])[..., None]
    assert dep.min() >= 0.0 and dep.max() <= 1.0 + 1e-3
    assert np.abs(dep[~mask]).max() == 0.0
    assert dep[mask].min() >= 0.3 - 1e-2
    # encoded view-space normals land in [0,1] and decode to ~unit vectors
    nrm = np.asarray(d.normals, np.float32)
    assert nrm.min() >= -1e-3 and nrm.max() <= 1.0 + 1e-3
    dec = nrm[mask[..., 0]] * 2.0 - 1.0
    ln = np.linalg.norm(dec, axis=-1)
    assert np.percentile(np.abs(ln - 1.0), 90) < 0.1


def test_prerender_probe_content(dm):
    d = dm.data
    gb = d.gbuffers[0]
    mask = np.asarray(gb.mask)
    lm = np.asarray(d.lightmaps[0, 0], dtype=np.float32)
    # background zero, some foreground signal
    # (resized maps: test interior by eroding via min filter approximation)
    assert lm[~mask].mean() < 0.2
    assert lm[mask].mean() > 0.01
    # probes are sRGB-encoded in [0, ~1]
    assert lm.max() <= 1.0 + 1e-3


def test_collate_batch(dm):
    b = dm.collate(step=0)
    assert b["condition_map"].shape == (1, 24, 24, 22)
    assert 0 <= int(b["env_id"]) < 2
    assert b["elevation"].shape == (1,)
    # two draws differ eventually (random view/env)
    views = {dm.collate(step=i)["view_id"] for i in range(20)}
    assert len(views) > 1


def test_eval_view(dm):
    b = dm.eval_view(0)
    assert b["gbuffer"].mask.shape == (24, 24)
    # reference pins eval env 4 (uncond.py:926); clamped to the configured
    # env count (2 here) so the lookup can't go out of range
    assert int(b["env_id"]) == 1


def test_loggers(tmp_path):
    from dreammat_tpu.utils.loggers import CSVLogger, ProgressWriter, TSVEventLogger

    c = CSVLogger(str(tmp_path))
    c.log({"loss": 1.0}, 1)
    c.log({"loss": 0.5}, 2)
    txt = open(tmp_path / "metrics.csv").read()
    assert "loss" in txt and "0.5" in txt
    t = TSVEventLogger(str(tmp_path))
    t.log({"a": 2.0}, 5)
    assert "a\t2" in open(tmp_path / "events.tsv").read()
    p = ProgressWriter(str(tmp_path / "progress"))
    p.update(50, 100)
    assert "50.0%" in open(tmp_path / "progress").read()


@pytest.fixture(scope="module")
def dm_random():
    """Random-camera mode (use_fix_views=false): per-step sampled cameras
    with perturbs (reference RandomCameraIterableDataset, uncond.py:66-338)."""
    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(1))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent", "n_environments": 2,
            "env_height": 16, "env_width": 32,
            "diffuse_sample_num": 8, "specular_sample_num": 4,
            "use_prefiltered": True,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    dm = dreammat_tpu.find("random-camera-datamodule")(
        {
            "width": 24, "height": 24, "eval_width": 24, "eval_height": 24,
            "use_fix_views": False, "fix_env_num": 2,
            "camera_perturb": 0.1, "center_perturb": 0.05, "up_perturb": 0.02,
            "progressive_until": 10,
            "cond_height": 24, "cond_width": 24,
            "prerender_cache_dir": None, "n_test_views": 2,
        },
        ren, mat,
    )
    dm.setup()
    return dm


def test_random_mode_collate(dm_random):
    b = dm_random.collate(step=0)
    assert b["condition_map"].shape == (1, 24, 24, 22)
    assert b["gbuffer"].mask.shape == (24, 24)
    assert 0 <= int(b["env_id"]) < 2
    cmap = np.asarray(b["condition_map"])
    # 22-ch condition stack: depth/normal/probes all live in [0,1] after
    # the reference's normalization (uncond.py:540-557, lin2srgb probes)
    assert cmap.min() >= 0.0 and cmap.max() <= 1.0 + 1e-3
    V = dm_random.renderer.mesh.v_pos.shape[0]
    assert b["light_table"].shape[0] == V
    # fixed pixel budget across steps => one jitted train-step shape
    b2 = dm_random.collate(step=500)
    assert b2["gbuffer"].fg_idx.shape == b["gbuffer"].fg_idx.shape
    # cameras actually vary
    els = {float(dm_random.collate(step=i)["elevation"][0]) for i in range(6)}
    assert len(els) > 1


def test_random_mode_progressive(dm_random):
    """Early steps stay near the eval elevation; late steps span the range
    (reference progressive_view, uncond.py:125-133)."""
    early = [float(dm_random.collate(step=0)["azimuth"][0]) for _ in range(8)]
    late = [float(dm_random.collate(step=1000)["azimuth"][0]) for _ in range(8)]
    assert max(abs(a) for a in early) <= 180.0 / 11 + 1e-3
    assert max(abs(a) for a in late) > 30.0


def test_random_mode_eval_view(dm_random):
    b = dm_random.eval_view(0)
    assert b["gbuffer"].mask.shape == (24, 24)
    assert b["light_table"] is not None


def test_fastpath_check_and_fallback():
    """fastpath_check measures prefiltered-vs-exact RMSE at setup and drops
    the tables above the threshold (VERDICT r1 #4 auto-fallback)."""
    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(1))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent", "n_environments": 1,
            "env_height": 16, "env_width": 32,
            "diffuse_sample_num": 32, "specular_sample_num": 32,
            "use_prefiltered": True,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    base = {
        "width": 24, "height": 24, "fix_view_num": 1, "fix_env_num": 1,
        "cond_height": 24, "cond_width": 24, "prerender_cache_dir": None,
        "fastpath_check": True,
    }
    dm1 = dreammat_tpu.find("random-camera-datamodule")(dict(base), ren, mat)
    dm1.setup()
    assert dm1.data.table_spec is not None  # sphere: well under threshold

    mat.set_baked_visibility(None)  # fresh renderer state for second module
    ren2 = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    dm2 = dreammat_tpu.find("random-camera-datamodule")(
        dict(base, fastpath_rmse_threshold=1e-6), ren2, mat
    )
    dm2.setup()
    assert dm2.data.table_spec is None  # impossible threshold -> fallback

    # gradient-space gate: cosine can never reach 1.1, so the tables must
    # drop even though the color RMSE is fine (torus failure mode: image
    # looks right, training signal is wrong)
    mat.set_baked_visibility(None)
    ren3 = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    dm3 = dreammat_tpu.find("random-camera-datamodule")(
        dict(base, fastpath_grad_cos_threshold=1.1), ren3, mat
    )
    dm3.setup()
    assert dm3.data.table_spec is None


def test_fastpath_auto_gate():
    """fastpath_check="auto": convex meshes skip the fidelity check (tables
    kept, no exact-MC view rendered); forcing the occlusion threshold to 0
    makes auto run the check, and an impossible RMSE threshold then drops
    the tables — the default config cannot silently train a self-occluding
    mesh on prefiltered gradients (VERDICT r3 #3)."""
    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(1))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent", "n_environments": 1,
            "env_height": 16, "env_width": 32,
            "diffuse_sample_num": 32, "specular_sample_num": 32,
            "use_prefiltered": True,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    base = {
        "width": 24, "height": 24, "fix_view_num": 1, "fix_env_num": 1,
        "cond_height": 24, "cond_width": 24, "prerender_cache_dir": None,
        "fastpath_check": "auto",
        # impossible RMSE threshold: if the check RUNS, the tables drop
        "fastpath_rmse_threshold": 1e-9,
    }
    dm1 = dreammat_tpu.find("random-camera-datamodule")(dict(base), ren, mat)
    dm1.setup()
    # sphere is convex -> auto SKIPPED the check -> tables survive even the
    # impossible threshold
    assert dm1.data.table_spec is not None

    mat.set_baked_visibility(None)
    ren2 = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    dm2 = dreammat_tpu.find("random-camera-datamodule")(
        dict(base, fastpath_occlusion_threshold=0.0), ren2, mat
    )
    dm2.setup()
    # occlusion threshold 0 forces auto to run the check -> tables drop
    assert dm2.data.table_spec is None


def test_static_maps_rotation():
    """HBM budget smaller than one view's maps -> resident window of one
    view that rotates through all views; every batch still carries enc_maps
    (the scatter-free fast path) and long-run view coverage is complete."""
    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(1))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent", "n_environments": 1,
            "env_height": 16, "env_width": 32,
            "diffuse_sample_num": 8, "specular_sample_num": 4,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    dm = dreammat_tpu.find("random-camera-datamodule")(
        {
            "width": 24, "height": 24, "fix_view_num": 4, "fix_env_num": 1,
            "cond_height": 24, "cond_width": 24, "prerender_cache_dir": None,
            "static_maps_budget_mb": 0, "static_maps_rotate": 2,
        },
        ren, mat,
    )
    dm.setup()
    assert dm._maps_resident == [0]  # budget 0 keeps exactly one view

    seen = set()
    for step in range(16):
        resident_before = list(dm._maps_resident)
        b = dm.collate(step=step)
        assert b["enc_maps"] is not None  # every step on the fast path
        assert len(dm._maps_resident) == 1  # window size holds
        assert b["view_id"] in resident_before + dm._maps_resident
        seen.add(b["view_id"])
        # evicted views must have their maps freed
        for v in range(4):
            if v not in dm._maps_resident:
                assert dm._enc_maps[v] is None
    assert seen == {0, 1, 2, 3}  # the window cycled through every view


def test_hybrid_mc_interleave():
    """hybrid_mc_every: scheduled steps drop the light table so the jitted
    step shades through the exact MC estimator (gradient-bias bound for
    baked visibility under hard self-occlusion)."""
    geo = dreammat_tpu.find("dreammat-mesh")(
        {
            "shape_init": "procedural:sphere",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
        }
    )
    geo.set_mesh(make_icosphere(1))
    mat = dreammat_tpu.find("dreammat-material")(
        {
            "environment_texture": "/nonexistent", "n_environments": 1,
            "env_height": 16, "env_width": 32,
            "diffuse_sample_num": 8, "specular_sample_num": 4,
        }
    )
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("raytracing-renderer")({}, geo, mat, bg)
    dmod = dreammat_tpu.find("random-camera-datamodule")(
        {
            "width": 16, "height": 16, "fix_view_num": 2, "fix_env_num": 1,
            "cond_height": 16, "cond_width": 16, "n_test_views": 2,
            "prerender_cache_dir": None, "static_field_maps": False,
            "hybrid_mc_every": 3,
        },
        ren, mat,
    )
    dmod.setup()
    assert dmod.data.table_spec is not None
    for step in range(6):
        b = dmod.collate(step=step)
        if step % 3 == 0:
            assert b["light_table"] is None, f"step {step} should be exact-MC"
        else:
            assert b["light_table"] is not None, f"step {step} should use tables"
