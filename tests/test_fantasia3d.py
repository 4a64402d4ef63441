"""DMTet geometry + mesh rasterizer + fantasia3d system."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.models  # noqa: F401
import dreammat_tpu.systems  # noqa: F401


@pytest.fixture(scope="module")
def dmtet_setup():
    geo = dreammat_tpu.find("tetrahedra-sdf-grid")(
        {
            "radius": 1.0, "isosurface_resolution": 12,
            "max_crossing_tets": 2048, "shape_init": "sphere",
            "shape_init_params": 0.5, "n_feature_dims": 3,
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4,
                "per_level_scale": 1.5,
            },
            "mlp_network_config": {"n_neurons": 8, "n_hidden_layers": 1},
        }
    )
    params = geo.init(jax.random.PRNGKey(0))
    mat = dreammat_tpu.find("no-material")({"n_output_dims": 3})
    bg = dreammat_tpu.find("solid-color-background")({})
    rend = dreammat_tpu.find("nvdiff-rasterizer")(
        {"radius": 1.0, "sdf_opacity_samples": 16, "face_chunk": 512},
        geo, mat, bg,
    )
    return geo, params, bg, rend


def _fwd_rays(n=16):
    ys, xs = jnp.meshgrid(
        jnp.linspace(-0.4, 0.4, n), jnp.linspace(-0.4, 0.4, n), indexing="ij"
    )
    ro = jnp.stack([xs, ys, jnp.full_like(xs, 2.0)], -1).reshape(-1, 3)
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), ro.shape)
    light = jnp.broadcast_to(jnp.asarray([2.0, 2.0, 2.0]), ro.shape)
    return ro, rd, light


def test_dmtet_geometry_sphere_init(dmtet_setup):
    geo, params, _, _ = dmtet_setup
    out = geo.isosurface(params)
    assert int(out.valid.sum()) > 50
    tv = np.asarray(out.tri_verts)[np.asarray(out.valid)]
    d = np.linalg.norm(tv.reshape(-1, 3), axis=-1)
    assert abs(d.mean() - 0.5) < 0.1


def test_rasterizer_renders_sphere(dmtet_setup):
    geo, params, bg, rend = dmtet_setup
    ro, rd, light = _fwd_rays()
    out = rend.render_rays(
        params, bg.init(jax.random.PRNGKey(0)), {}, ro, rd, light,
        jax.random.PRNGKey(1), is_train=True,
    )
    hit = np.asarray(out["hit"]).reshape(16, 16)
    # center rays hit, corner rays depend on sphere silhouette
    assert hit[8, 8]
    assert not hit[0, 0]
    # depth ~ 2 - 0.5 at the center
    depth = np.asarray(out["depth"]).reshape(16, 16)
    assert abs(depth[8, 8] - 1.5) < 0.15
    # center normal points toward the camera (+z)
    n = np.asarray(out["comp_normal"]).reshape(16, 16, 3)[8, 8] * 2 - 1
    assert n[2] > 0.8
    # opacity: high inside, low outside
    op = np.asarray(out["opacity"]).reshape(16, 16)
    assert op[8, 8] > 0.9 and op[0, 0] < 0.3


def test_rasterizer_gradients_reach_sdf(dmtet_setup):
    geo, params, bg, rend = dmtet_setup
    ro, rd, light = _fwd_rays(8)
    bgp = bg.init(jax.random.PRNGKey(0))

    def loss_normal(p):
        out = rend.render_rays(p, bgp, {}, ro, rd, light,
                               jax.random.PRNGKey(1), is_train=True)
        return jnp.sum(out["comp_normal"])

    def loss_op(p):
        out = rend.render_rays(p, bgp, {}, ro, rd, light,
                               jax.random.PRNGKey(1), is_train=True)
        return jnp.sum(out["opacity"])

    g1 = jax.grad(loss_normal)(params)
    g2 = jax.grad(loss_op)(params)
    assert float(jnp.abs(g1["sdf"]).max()) > 0          # via marching tets
    assert float(jnp.abs(g1["deformation"]).max()) > 0  # via vertex motion
    assert float(jnp.abs(g2["sdf"]).max()) > 0          # via SDF silhouette
    for g in (g1, g2):
        # all gradient leaves bounded (subsumes finite)
        assert all(float(np.abs(np.asarray(l)).max()) < 1e6
                   for l in jax.tree_util.tree_leaves(g))


def test_fantasia3d_geometry_stage(tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "fantasia3d_tiny.yaml"),
        cli_args=[
            "system.prompt_processor.prompt=a stone hamburger",
            f"exp_root_dir={tmp_path}/outputs",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    assert int(state["step"]) == 2
    leaves = jax.tree_util.tree_leaves(state["geo"])
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    # sdf actually moved
    p0 = system.geometry.init(jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(state["geo"]["sdf"]), np.asarray(p0["sdf"]))
    p = system.validation(state, dm, cfg.trial_dir, 2)
    assert os.path.exists(p)


def test_fantasia3d_texture_stage(tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "fantasia3d_tiny.yaml"),
        cli_args=[
            "system.prompt_processor.prompt=a stone hamburger",
            "system.texture=true",
            "system.loss!={lambda_sds: 1.0}",
            f"exp_root_dir={tmp_path}/outputs",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    assert int(state["step"]) == 2
    # geometry frozen, features trained
    p0 = system.geometry.init(jax.random.PRNGKey(0))
    assert "deformation" not in state["geo"]
    assert np.allclose(np.asarray(state["geo"]["sdf"]), np.asarray(p0["sdf"]))
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state["geo"]["feature_mlp"])[0]),
        np.asarray(jax.tree_util.tree_leaves(p0["feature_mlp"])[0]),
    )


def test_magic3d_refinement_trains(tmp_path):
    """The magic3d refinement stage optimizes a DMTet mesh through the
    rasterizer (SDS on rgb + normal consistency, magic3d.py:76-81)."""
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "dreamfusion_tiny.yaml"),
        cli_args=[
            "system_type=magic3d-system",
            "system.prompt_processor.prompt=a stone hamburger",
            "system.refinement=true",
            "system.geometry_type=tetrahedra-sdf-grid",
            "system.geometry!={radius: 1.0, isosurface_resolution: 12, max_crossing_tets: 2048, shape_init: sphere, shape_init_params: 0.5, n_feature_dims: 3, pos_encoding_config: {otype: HashGrid, n_levels: 2, n_features_per_level: 2, log2_hashmap_size: 8, base_resolution: 4, per_level_scale: 1.5}, mlp_network_config: {n_neurons: 8, n_hidden_layers: 1}}",
            "system.renderer_type=nvdiff-rasterizer",
            "system.renderer!={radius: 1.0, sdf_opacity_samples: 8, face_chunk: 512}",
            "system.material_type=no-material",
            "system.material!={n_output_dims: 3}",
            "system.background_type=solid-color-background",
            "system.background!={}",
            "system.loss!={lambda_sds: 1.0, lambda_normal_consistency: 1000.0}",
            f"exp_root_dir={tmp_path}/outputs",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    assert int(state["step"]) == 2
    p0 = system.geometry.init(jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(state["geo"]["sdf"]), np.asarray(p0["sdf"]))
