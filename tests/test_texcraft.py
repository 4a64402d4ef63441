"""TexCraft sibling system + plain SDS guidance (reference
systems/texcraft.py:23-175, models/guidance/stable_diffusion_guidance.py:
21-296): guidance type from config, live depth/normal conditions, generic
loss_* accumulation — the registry extension points exercised end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dreammat_tpu
import dreammat_tpu.data  # noqa: F401
import dreammat_tpu.models  # noqa: F401
import dreammat_tpu.systems  # noqa: F401


def _write_sphere_obj(path):
    from dreammat_tpu.models.mesh import make_icosphere

    m = make_icosphere(1)
    with open(path, "w") as f:
        for v in np.asarray(m.v_pos):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in np.asarray(m.t_pos_idx):
            f.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    return str(path)


def _tiny_system(mesh_path, guidance_overrides=None):
    g = {
        "model_size": "tiny", "half_precision_weights": False,
        "use_controlnet": False, "width": 32, "height": 32,
        "cache_dir": None, "controlnet_path": None,
        "guidance_scale": 7.5,
    }
    g.update(guidance_overrides or {})
    return dreammat_tpu.find("texcraft-system")(
        {
            "init_width": 32, "init_height": 32,
            "geometry": {
                "shape_init": f"mesh:{mesh_path}",
                "pos_encoding_config": {
                    "otype": "HashGrid", "n_levels": 2, "n_features_per_level": 2,
                    "log2_hashmap_size": 8, "base_resolution": 4,
                    "per_level_scale": 1.5,
                },
            },
            "material": {
                "environment_texture": "/nonexistent", "n_environments": 2,
                "env_height": 16, "env_width": 32,
                "diffuse_sample_num": 8, "specular_sample_num": 8,
                "use_prefiltered": True,
            },
            "guidance": g,
            "prompt_processor": {
                "prompt": "a tin robot", "model_size": "tiny", "use_cache": False,
            },
        }
    )


def test_texcraft_two_steps_update_params(tmp_path):
    system = _tiny_system(_write_sphere_obj(tmp_path / "sphere.obj"))
    dm = dreammat_tpu.find("random-camera-datamodule")(
        {
            "width": 32, "height": 32, "fix_view_num": 2, "fix_env_num": 2,
            "cond_height": 32, "cond_width": 32, "prerender_cache_dir": None,
        },
        system.renderer, system.material,
    )
    dm.setup()
    state = system.fit(
        dm, max_steps=2, seed=0, trial_dir=str(tmp_path),
        val_check_interval=0, checkpoint_every=0, log_every=1,
    )
    assert int(state["step"]) == 2
    leaves = jax.tree_util.tree_leaves(state["geo"])
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    p0 = system.geometry.init(jax.random.PRNGKey(0))
    moved = float(abs(np.asarray(state["geo"]["table"]) - np.asarray(p0["table"])).max())
    assert moved > 0.0


def test_sds_guidance_grad_formula():
    """The SDS loss must backprop exactly grad = w(t)(eps_cfg - noise) into
    the latents (reparam trick, stable_diffusion_guidance.py:273-296)."""
    guidance = dreammat_tpu.find("stable-diffusion-guidance")(
        {
            "model_size": "tiny", "half_precision_weights": False,
            "use_controlnet": False, "width": 32, "height": 32,
            "cache_dir": None, "controlnet_path": None,
            "guidance_scale": 7.5, "min_step_percent": 0.3,
            "max_step_percent": 0.3, "view_dependent_prompting": False,
        }
    )
    rng = jax.random.PRNGKey(0)
    guidance.init_params(rng)
    pp = dreammat_tpu.find("stable-diffusion-prompt-processor")(
        {"prompt": "x", "model_size": "tiny", "use_cache": False}
    )
    pu = pp()
    B = 1
    elev = jnp.zeros((B,))
    azim = jnp.zeros((B,))
    dist = jnp.ones((B,))
    rgb = jax.random.uniform(jax.random.fold_in(rng, 1), (B, 32, 32, 3))

    def loss_fn(rgb):
        out = guidance(
            guidance.params, rgb, pu, elev, azim, dist, None,
            step=jnp.int32(0), rng=jax.random.PRNGKey(42),
        )
        return out["loss_sds"]

    val, g = jax.value_and_grad(loss_fn)(rgb)
    assert 0.0 <= float(val) < 1e6  # bounded subsumes finite
    gmax = float(jnp.abs(g).max())
    assert 0.0 < gmax < 1e4


def test_sds_weighting_strategies():
    for ws, expect in [
        ("sds", lambda a: 1 - a),
        ("uniform", lambda a: np.ones_like(a)),
        ("fantasia3d", lambda a: np.sqrt(a) * (1 - a)),
    ]:
        guidance = dreammat_tpu.find("stable-diffusion-guidance")(
            {
                "model_size": "tiny", "half_precision_weights": False,
                "use_controlnet": False, "width": 32, "height": 32,
                "cache_dir": None, "controlnet_path": None,
                "weighting_strategy": ws,
            }
        )
        t = jnp.asarray([10, 500, 900])
        a = np.asarray(guidance.schedule["alphas_cumprod"])[np.asarray(t)]
        w = np.asarray(guidance._weight(t)).reshape(-1)
        assert np.allclose(w, expect(a), atol=1e-6), ws


def test_sds_guidance_with_depth_controlnet():
    """texcraft's live-condition path: a 'depth' controlnet consumes channel
    0 of the live condition map through the shared _image_conditions."""
    guidance = dreammat_tpu.find("stable-diffusion-guidance")(
        {
            "model_size": "tiny", "half_precision_weights": False,
            "use_controlnet": True, "control_types": ["depth"],
            "width": 32, "height": 32,
            "cache_dir": None, "controlnet_path": None,
        }
    )
    rng = jax.random.PRNGKey(0)
    guidance.init_params(rng)
    pp = dreammat_tpu.find("stable-diffusion-prompt-processor")(
        {"prompt": "x", "model_size": "tiny", "use_cache": False}
    )
    pu = pp()
    rgb = jax.random.uniform(rng, (1, 32, 32, 3))
    cond = jax.random.uniform(jax.random.fold_in(rng, 2), (1, 32, 32, 4))
    out = guidance(
        guidance.params, rgb, pu, jnp.zeros((1,)), jnp.zeros((1,)),
        jnp.ones((1,)), cond, step=jnp.int32(0), rng=jax.random.PRNGKey(1),
    )
    assert 0.0 <= float(out["loss_sds"]) < 1e6  # bounded subsumes finite
