"""GAN renderer + Control4D system."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.data  # noqa: F401
import dreammat_tpu.models  # noqa: F401
import dreammat_tpu.systems  # noqa: F401

from tests.test_in2n import _make_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return _make_scene(str(tmp_path_factory.mktemp("c4d")), hw=48)


@pytest.fixture(scope="module")
def gan_setup():
    geo = dreammat_tpu.find("implicit-volume")(
        {
            "radius": 1.0, "n_feature_dims": 11,
            "normal_type": "finite_difference",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                "log2_hashmap_size": 8, "base_resolution": 4,
                "per_level_scale": 1.5,
            },
            "mlp_network_config": {"n_neurons": 8, "n_hidden_layers": 1},
        }
    )
    mat = dreammat_tpu.find("hybrid-rgb-latent-material")({"n_output_dims": 11})
    bg = dreammat_tpu.find("solid-color-background")({"n_output_dims": 11})
    rend = dreammat_tpu.find("gan-volume-renderer")(
        {
            "ch": 16, "local_ch": 8, "z_channels": 4, "global_dim": 16,
            "disc_ndf": 16, "disc_layers": 2,
            "base_renderer_type": "nerf-volume-renderer",
            "base_renderer": {
                "radius": 1.0, "num_samples_per_ray": 16,
                "estimator": "occgrid", "grid_resolution": 8,
            },
        },
        geo, mat, bg,
    )
    return geo, bg, rend


def test_gan_renderer_levels_and_grads(gan_setup):
    geo, bg, rend = gan_setup
    k = jax.random.PRNGKey(0)
    geo_params = geo.init(k)
    bg_params = bg.init(k)
    state = rend.update_occ(geo_params, rend.init_state(k), k)
    H = W = 24
    gan_params = rend.init_params(k, H, W)

    ys, xs = jnp.meshgrid(
        jnp.linspace(-0.5, 0.5, H), jnp.linspace(-0.5, 0.5, W), indexing="ij"
    )
    ro = jnp.stack([xs, ys, jnp.full_like(xs, 2.0)], -1).reshape(-1, 3)
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), ro.shape)
    light = jnp.broadcast_to(jnp.asarray([2.0, 2.0, 2.0]), ro.shape)
    gt = jax.random.uniform(jax.random.PRNGKey(5), (H, W, 3))

    for level in (0, 1, 2):
        out = rend.render_rays(
            geo_params, bg_params, state, ro, rd, light,
            jax.random.PRNGKey(1), is_train=True, gan_params=gan_params,
            gt_rgb=gt, generator_level=level,
            int_offsets=(jnp.int32(2), jnp.int32(3)), height=H, width=W,
        )
        assert out["comp_gan_rgb"].shape == (H * W, 3)
        assert out["comp_rgb"].shape == (H * W, 3)
        assert out["comp_int_rgb"].shape[0] == out["comp_gt_rgb"].shape[0]
        # bounded outputs (subsumes finite: NaN fails the bound)
        assert float(np.abs(np.asarray(out["comp_gan_rgb"])).max()) < 1e4
        assert 0.0 <= float(out["kl"]) < 1e6  # KL is non-negative

    # generator grads flow into generator AND the NeRF (through lr_rgb)
    def loss(gp, geo_p):
        out = rend.render_rays(
            geo_p, bg_params, state, ro, rd, light, jax.random.PRNGKey(1),
            is_train=True, gan_params=gp, gt_rgb=gt, generator_level=0,
            int_offsets=(jnp.int32(0), jnp.int32(0)), height=H, width=W,
        )
        return jnp.sum(out["comp_gan_rgb"])

    g_gan, g_geo = jax.grad(loss, argnums=(0, 1))(gan_params, geo_params)
    assert float(jnp.abs(
        jax.tree_util.tree_leaves(g_gan["generator"])[0]).max()) > 0
    assert any(
        float(jnp.abs(l).max()) > 0 for l in jax.tree_util.tree_leaves(g_geo)
    )

    # discriminator + hinge losses
    from dreammat_tpu.utils import gan as ganlib

    fake = out["comp_gan_rgb"].reshape(1, H, W, 3)
    d = ganlib.discriminator_loss(
        rend.disc_apply, gan_params["discriminator"], gt[None], fake
    )
    g = ganlib.generator_loss(
        rend.disc_apply, gan_params["discriminator"], fake
    )
    # hinge disc loss is non-negative by construction; generator loss is
    # -mean(disc(fake)): bounded and nonzero at random init. Bounds
    # subsume finiteness (NaN fails every comparison).
    assert 0.0 <= float(d) < 1e4
    assert 0.0 < abs(float(g)) < 1e4


def test_control4d_system_trains(scene, tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "dreamfusion_tiny.yaml"),
        cli_args=[
            "system_type=control4d-multiview-system",
            "data_type=multiview-camera-datamodule",
            f"data!={{dataroot: {scene}, train_downsample_resolution: 2}}",
            "system.prompt_processor.prompt=make it a painting",
            "system.guidance_type=stable-diffusion-instructpix2pix-guidance",
            "system.guidance!={model_size: tiny, half_precision_weights: false, diffusion_steps: 2, fixed_size: 16}",
            "system.geometry.n_feature_dims=11",
            "system.material_type=hybrid-rgb-latent-material",
            "system.material!={n_output_dims: 11}",
            "system.background_type=solid-color-background",
            "system.background!={n_output_dims: 11}",
            "system.renderer_type=gan-volume-renderer",
            "system.renderer!={ch: 16, local_ch: 8, z_channels: 4, global_dim: 16, disc_ndf: 16, disc_layers: 2, base_renderer_type: nerf-volume-renderer, base_renderer: {radius: 1.0, num_samples_per_ray: 16, estimator: occgrid, grid_resolution: 8}}",
            "system.per_editing_step=1",
            "system.start_editing_step=0",
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
    assert "gan" in state and "opt_d" in state
    assert len(system.edit_frames) >= 1
    leaves = jax.tree_util.tree_leaves(
        {"geo": state["geo"], "gan": state["gan"]}
    )
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    from conftest import assert_state_moved

    def prep_gan(sys0, state0):
        # Reproduce fit(seed=0)'s key chain up to step 0's _ensure_gan call
        # (fit: k_init,k_guidance,rng = split(PRNGKey(seed),3); per-step
        # rng,k = split(rng); _apply_train_step: k_gan = split(k,3)[0]) so
        # the lazily-created GAN params match the trained run's init.
        rng = jax.random.PRNGKey(0)
        _, _, rng = jax.random.split(rng, 3)
        _, k = jax.random.split(rng)
        k_gan, _, _ = jax.random.split(k, 3)
        return sys0._ensure_gan(state0, dm.collate(step=0), k_gan)

    assert_state_moved(state, dreammat_tpu.find(cfg.system_type), cfg, dm,
                       keys=["geo", "gan"], prep_state0=prep_gan)
    p = system.validation(state, dm, cfg.trial_dir, 2)
    assert os.path.exists(p)
