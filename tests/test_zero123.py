"""Zero123 guidance + single-image datamodule + system smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.models  # noqa: F401
import dreammat_tpu.systems  # noqa: F401


def _write_rgba(path, size=24):
    from PIL import Image

    rng = np.random.RandomState(0)
    rgba = np.zeros((size, size, 4), np.uint8)
    rgba[4:-4, 4:-4, :3] = rng.randint(80, 255, (size - 8, size - 8, 3))
    rgba[4:-4, 4:-4, 3] = 255
    Image.fromarray(rgba, "RGBA").save(path)
    return path


@pytest.fixture(scope="module")
def cond_png(tmp_path_factory):
    d = tmp_path_factory.mktemp("z123")
    return _write_rgba(str(d / "cond_rgba.png"))


@pytest.fixture(scope="module")
def z123(cond_png):
    g = dreammat_tpu.find("zero123-guidance")(
        {
            "model_size": "tiny", "half_precision_weights": False,
            "width": 24, "height": 24, "cond_image_path": cond_png,
            "cond_elevation_deg": 0.0, "cond_azimuth_deg": 0.0,
            "cond_camera_distance": 1.5, "guidance_scale": 5.0,
        }
    )
    g.init_params(jax.random.PRNGKey(0))
    return g


def test_zero123_guidance_grad(z123):
    g = z123
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 24, 24, 3))
    elev = jnp.asarray([20.0])
    azim = jnp.asarray([90.0])
    dist = jnp.asarray([1.5])

    out = g(g.params, rgb, elev, azim, dist, step=0, rng=jax.random.PRNGKey(2))
    # bounded non-negative loss (subsumes finiteness)
    assert 0.0 <= float(out["loss_sds"]) < 1e6

    grad = jax.grad(
        lambda x: g(g.params, x, elev, azim, dist, step=0,
                    rng=jax.random.PRNGKey(2))["loss_sds"]
    )(rgb)
    # nonzero AND bounded image gradient (NaN/inf fail the upper bound)
    gmax = float(jnp.abs(grad).max())
    assert 0.0 < gmax < 1e4


def test_zero123_vsd_guidance(cond_png):
    """zero123 VSD: both losses finite; loss_vsd's gradient flows to the
    image (not the LoRA), loss_lora's to the LoRA (not the image) — the
    stop-gradient isolation the torch original gets from optimizer
    bookkeeping (zero123_unified_guidance.py:409-511)."""
    g = dreammat_tpu.find("zero123-vsd-guidance")(
        {
            "model_size": "tiny", "half_precision_weights": False,
            "width": 24, "height": 24, "cond_image_path": cond_png,
            "guidance_scale": 3.0, "guidance_scale_phi": 1.0,
            "lora_rank": 2, "camera_condition_type": "extrinsics",
        }
    )
    g.init_params(jax.random.PRNGKey(0))
    lora = g.init_lora(jax.random.PRNGKey(1))
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (1, 24, 24, 3))
    elev, azim, dist = (jnp.asarray([20.0]), jnp.asarray([90.0]),
                        jnp.asarray([1.5]))
    c2w = jnp.eye(4)[None]
    out = g(g.params, rgb, elev, azim, dist, c2w=c2w, lora_params=lora,
            step=0, rng=jax.random.PRNGKey(3))
    assert 0.0 <= float(out["loss_vsd"]) < 1e6   # bounded subsumes finite
    assert 0.0 <= float(out["loss_lora"]) < 1e6

    g_img, g_lora = jax.grad(
        lambda x, lp: g(g.params, x, elev, azim, dist, c2w=c2w,
                        lora_params=lp, step=0,
                        rng=jax.random.PRNGKey(3))["loss_vsd"],
        argnums=(0, 1),
    )(rgb, lora)
    assert float(jnp.abs(g_img).max()) > 0.0
    assert all(
        float(jnp.abs(l).max()) == 0.0
        for l in jax.tree_util.tree_leaves(g_lora)
    )

    g_img2, g_lora2 = jax.grad(
        lambda x, lp: g(g.params, x, elev, azim, dist, c2w=c2w,
                        lora_params=lp, step=0,
                        rng=jax.random.PRNGKey(3))["loss_lora"],
        argnums=(0, 1),
    )(rgb, lora)
    assert float(jnp.abs(g_img2).max()) == 0.0
    assert any(
        float(jnp.abs(l).max()) > 0.0
        for l in jax.tree_util.tree_leaves(g_lora2)
    )

    # spherical camera conditioning path also traces
    g2 = dreammat_tpu.find("zero123-vsd-guidance")(
        {
            "model_size": "tiny", "half_precision_weights": False,
            "width": 24, "height": 24, "cond_image_path": cond_png,
            "camera_condition_type": "spherical", "lora_rank": 2,
        }
    )
    g2.params = g.params
    lora2 = g2.init_lora(jax.random.PRNGKey(4))
    out2 = g2(g2.params, rgb, elev, azim, dist, c2w=c2w, lora_params=lora2,
              step=0, rng=jax.random.PRNGKey(5))
    assert 0.0 <= float(out2["loss_vsd"]) < 1e6  # bounded subsumes finite


def test_zero123_pose_conditioning_changes_eps(z123):
    """Different relative poses produce different CFG contexts — the pose
    token must actually reach the UNet."""
    g = z123
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 24, 24, 3))
    k = jax.random.PRNGKey(7)
    a = g(g.params, rgb, jnp.asarray([0.0]), jnp.asarray([0.0]),
          jnp.asarray([1.5]), step=0, rng=k)
    b = g(g.params, rgb, jnp.asarray([30.0]), jnp.asarray([120.0]),
          jnp.asarray([1.8]), step=0, rng=k)
    assert float(a["loss_sds"]) != float(b["loss_sds"])


def test_cc_projection_identity_init(z123):
    """At init the cc_projection passes the CLIP token through (upstream
    Zero123 finetuning init) so pose deltas start as small perturbations."""
    g = z123
    ctx, concat = g.get_cond(
        g.params, jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([1.5])
    )
    # cond half of the context ~ c_crossattn (pose tail ~1e-3 noise)
    cond_tok = ctx[1]
    assert np.allclose(
        np.asarray(cond_tok), np.asarray(g.params["c_crossattn"][0]), atol=1e-2
    )
    # uncond halves are exactly zero
    assert float(jnp.abs(ctx[0]).max()) == 0.0
    assert float(jnp.abs(concat[0]).max()) == 0.0


def test_single_image_datamodule(cond_png):
    dm = dreammat_tpu.find("single-image-datamodule")(
        {
            "height": 24, "width": 24, "image_path": cond_png,
            "default_elevation_deg": 0.0, "default_azimuth_deg": 0.0,
            "default_camera_distance": 1.5, "rays_noise_scale": 1e-3,
            "n_test_views": 2,
        },
        None, None,
    )
    dm.setup()
    b = dm.collate(0)
    assert b["rgb"].shape == (24, 24, 3)
    assert b["mask"].shape == (24, 24, 1)
    assert b["rays_o"].shape == (24 * 24, 3)
    # interior of the synthetic image is opaque, border transparent
    m = np.asarray(b["mask"][..., 0])
    assert m[12, 12] == 1.0 and m[0, 0] == 0.0
    rc = b["random_camera"]
    assert rc["rays_o"].shape == (24 * 24, 3)
    # ray directions are unit vectors (stronger than finite)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rc["rays_d"]), axis=-1), 1.0, atol=1e-4)
    # eval circle comes from the embedded random-camera module
    ev = dm.eval_rays(0)
    assert ev["rays_o"].shape[:2] == (24, 24)


def test_zero123_system_trains(cond_png, tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "zero123_tiny.yaml"),
        cli_args=[
            f"data.image_path={cond_png}",
            f"system.guidance.cond_image_path={cond_png}",
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
    leaves = jax.tree_util.tree_leaves({"geo": state["geo"], "bg": state["bg"]})
    # every trained leaf bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    from conftest import assert_state_moved

    assert_state_moved(state, dreammat_tpu.find(cfg.system_type), cfg, dm,
                       keys=["geo"])
    p = system.validation(state, dm, cfg.trial_dir, 2)
    assert os.path.exists(p)


def test_zero123_simple_system_trains(cond_png, tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "zero123_tiny.yaml"),
        cli_args=[
            "system_type=zero123-simple-system",
            f"data.image_path={cond_png}",
            f"system.guidance.cond_image_path={cond_png}",
            "system.loss!={lambda_sds: 0.1, lambda_orient: 1.0, lambda_normal_smoothness_2d: 0.0, lambda_sparsity: 0.5, lambda_opaque: 0.5}",
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
    from conftest import assert_state_moved

    assert_state_moved(state, dreammat_tpu.find(cfg.system_type), cfg, dm,
                       keys=["geo"])


def test_magic123_system_trains(cond_png, tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "zero123_tiny.yaml"),
        cli_args=[
            "system_type=magic123-system",
            f"data.image_path={cond_png}",
            "system.guidance_type=stable-diffusion-guidance",
            "system.guidance!={model_size: tiny, half_precision_weights: false, width: 24, height: 24, cache_dir: null, guidance_scale: 100.0}",
            f"system.guidance_3d!={{model_size: tiny, half_precision_weights: false, width: 24, height: 24, cond_image_path: {cond_png}, guidance_scale: 5.0}}",
            "system.prompt_processor!={model_size: tiny, prompt: a red apple, use_cache: false}",
            "system.loss!={lambda_sds: 0.025, lambda_3d_sds: 1.0, lambda_rgb: 1000.0, lambda_mask: 100.0, lambda_orient: 1.0, lambda_normal_smoothness_2d: 0.0}",
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
    assert system.guidance_3d is not None
    leaves = jax.tree_util.tree_leaves(state["geo"])
    # every trained leaf bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    from conftest import assert_state_moved

    assert_state_moved(state, dreammat_tpu.find(cfg.system_type), cfg, dm,
                       keys=["geo"])


def test_magic123_refinement_trains(cond_png, tmp_path):
    """magic123 refinement=true: DMTet mesh + rasterizer with both priors
    and the normal-consistency + laplacian regularizers (reference
    magic123.py:127-139)."""
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "zero123_tiny.yaml"),
        cli_args=[
            "system_type=magic123-system",
            f"data.image_path={cond_png}",
            "system.refinement=true",
            "system.guidance_type=stable-diffusion-guidance",
            "system.guidance!={model_size: tiny, half_precision_weights: false, width: 24, height: 24, cache_dir: null, guidance_scale: 100.0}",
            f"system.guidance_3d!={{model_size: tiny, half_precision_weights: false, width: 24, height: 24, cond_image_path: {cond_png}, guidance_scale: 5.0}}",
            "system.prompt_processor!={model_size: tiny, prompt: a red apple, use_cache: false}",
            "system.geometry_type=tetrahedra-sdf-grid",
            "system.geometry!={radius: 1.0, isosurface_resolution: 10, max_crossing_tets: 1024, shape_init: sphere, shape_init_params: 0.5, n_feature_dims: 3, pos_encoding_config: {otype: HashGrid, n_levels: 2, n_features_per_level: 2, log2_hashmap_size: 8, base_resolution: 4, per_level_scale: 1.5}, mlp_network_config: {n_neurons: 8, n_hidden_layers: 1}}",
            "system.renderer_type=nvdiff-rasterizer",
            "system.renderer!={radius: 1.0, sdf_opacity_samples: 8, face_chunk: 512}",
            "system.material_type=no-material",
            "system.material!={n_output_dims: 3}",
            "system.loss!={lambda_sds: 0.025, lambda_3d_sds: 1.0, lambda_rgb: 1000.0, lambda_mask: 100.0, lambda_normal_consistency: 100.0, lambda_laplacian_smoothness: 10.0}",
            f"exp_root_dir={tmp_path}/outputs",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    assert system.cfg.geometry_type == "tetrahedra-sdf-grid"
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    assert int(state["step"]) == 2
    p0 = system.geometry.init(jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(state["geo"]["sdf"]), np.asarray(p0["sdf"]))


def test_image_condition_dreamfusion_trains(cond_png, tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "zero123_tiny.yaml"),
        cli_args=[
            "system_type=image-condition-dreamfusion-system",
            f"data.image_path={cond_png}",
            "system.guidance_type=stable-diffusion-guidance",
            "system.guidance!={model_size: tiny, half_precision_weights: false, width: 24, height: 24, cache_dir: null, guidance_scale: 100.0}",
            "system.prompt_processor!={model_size: tiny, prompt: a red apple, use_cache: false}",
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
    assert system.prompt_utils is not None  # prompted path


def test_zero123_refinement_trains(cond_png, tmp_path):
    """refinement=true switches to DMTet + rasterizer and trains with the
    mesh normal-consistency regularizer (zero123.py:197-208)."""
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "zero123_tiny.yaml"),
        cli_args=[
            f"data.image_path={cond_png}",
            f"system.guidance.cond_image_path={cond_png}",
            "system.refinement=true",
            "system.geometry_type=tetrahedra-sdf-grid",
            "system.geometry!={radius: 1.0, isosurface_resolution: 10, max_crossing_tets: 1024, shape_init: sphere, shape_init_params: 0.5, n_feature_dims: 3, pos_encoding_config: {otype: HashGrid, n_levels: 2, n_features_per_level: 2, log2_hashmap_size: 8, base_resolution: 4, per_level_scale: 1.5}, mlp_network_config: {n_neurons: 8, n_hidden_layers: 1}}",
            "system.renderer_type=nvdiff-rasterizer",
            "system.renderer!={radius: 1.0, sdf_opacity_samples: 8, face_chunk: 512}",
            "system.material_type=no-material",
            "system.material!={n_output_dims: 3}",
            "system.loss.lambda_normal_consistency=100.0",
            f"exp_root_dir={tmp_path}/outputs",
        ],
    )
    system = dreammat_tpu.find(cfg.system_type)(cfg.system)
    assert system.cfg.geometry_type == "tetrahedra-sdf-grid"
    dm = dreammat_tpu.find(cfg.data_type)(cfg.data, system.renderer, system.material)
    dm.setup()
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=cfg.trial_dir,
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    assert int(state["step"]) == 2
    p0 = system.geometry.init(jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(state["geo"]["sdf"]), np.asarray(p0["sdf"]))
