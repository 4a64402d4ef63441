"""Implicit-SDF geometry + NeuS renderer + textmesh system."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.models  # noqa: F401
import dreammat_tpu.systems  # noqa: F401


def _tiny_sdf(**over):
    return dreammat_tpu.find("implicit-sdf")(
        {
            "radius": 1.0,
            "sdf_bias": "sphere",
            "sdf_bias_params": 0.5,
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4, "per_level_scale": 1.5,
            },
            **over,
        }
    )


def test_sdf_bias_and_normals():
    geo = _tiny_sdf()
    params = geo.init(jax.random.PRNGKey(0))
    # zero the mlp output head so the field IS the analytic sphere bias
    params["sdf_mlp"] = jax.tree_util.tree_map(jnp.zeros_like, params["sdf_mlp"])
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.9, 0.0, 0.0]])
    sdf = np.asarray(geo.forward_sdf(params, pts))[:, 0]
    assert np.allclose(sdf, [-0.5, 0.0, 0.4], atol=1e-5)
    out = geo.apply(params, pts[1:2], output_normal=True)
    n = np.asarray(out["normal"])[0]
    assert np.allclose(n, [1.0, 0.0, 0.0], atol=0.05)  # outward on +x surface
    g = np.asarray(out["sdf_grad"])[0]
    assert abs(np.linalg.norm(g) - 1.0) < 0.05  # analytic sphere is eikonal


def test_shape_init_fit():
    geo = _tiny_sdf(sdf_bias=0.0, shape_init="sphere", shape_init_params=0.5,
                    shape_init_steps=150)
    params = geo.init(jax.random.PRNGKey(0))
    params = geo.initialize_shape(params, jax.random.PRNGKey(1))
    pts = jax.random.uniform(jax.random.PRNGKey(2), (512, 3), minval=-1, maxval=1)
    sdf = np.asarray(geo.forward_sdf(params, pts))[:, 0]
    gt = np.linalg.norm(np.asarray(pts), axis=-1) - 0.5
    assert np.mean((sdf - gt) ** 2) < 0.01


def test_neus_alpha_surface_localization():
    """NeuS weights concentrate at the zero crossing of a linear SDF."""
    geo = _tiny_sdf()
    mat = dreammat_tpu.find("diffuse-with-point-light-material")({"ambient_only_steps": 0})
    bg = dreammat_tpu.find("solid-color-background")({})
    ren = dreammat_tpu.find("neus-volume-renderer")(
        {"radius": 1.0, "num_samples_per_ray": 64, "grid_resolution": 8,
         "learned_variance_init": 0.3, "cos_anneal_end_steps": 0},
        geo, mat, bg,
    )
    var = ren.init_variance()
    # ray marching straight +z through a plane z=0 (sdf = -z along the ray:
    # positive before, negative after -> surface at t where z=0)
    S = 64
    t = jnp.broadcast_to(jnp.linspace(0.0, 2.0, S)[None], (1, S))
    sdf = 1.0 - t  # crossing at t=1
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, S, 3))
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (1, S, 3))
    delta = jnp.full((1, S), 2.0 / S)
    w = np.asarray(ren._alphas(sdf, normal, dirs, delta, var, step=0))
    peak_t = float(t[0, w[0].argmax()])
    assert abs(peak_t - 1.0) < 0.1
    assert w.sum() > 0.9  # crossing is (nearly) opaque


def test_neus_volsdf_mode():
    from dreammat_tpu.models.volume_renderer import volsdf_density

    s = jnp.asarray([-0.5, 0.0, 0.5])
    d = np.asarray(volsdf_density(s, 10.0))
    assert d[0] > d[1] > d[2]  # monotone: denser inside
    assert abs(d[1] - 5.0) < 1e-4  # at the surface: inv_std/2


def test_textmesh_trains(tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "dreamfusion_tiny.yaml"),
        cli_args=[
            "system_type=textmesh-system",
            "system.prompt_processor.prompt=a red apple",
            "system.geometry_type=implicit-sdf",
            "system.geometry.sdf_bias=sphere",
            "system.geometry.sdf_bias_params=0.5",
            "system.renderer_type=neus-volume-renderer",
            "system.renderer.learned_variance_init=0.3",
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
    leaves = jax.tree_util.tree_leaves(
        {"geo": state["geo"], "bg": state["bg"], "var": state["var"]}
    )
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    p = system.validation(state, dm, cfg.trial_dir, 2)
    assert os.path.exists(p)
    # sphere-biased SDF -> non-empty isosurface export
    obj = system.export(state, cfg.trial_dir)
    assert os.path.exists(obj)
