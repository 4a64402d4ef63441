"""Unified guidance factories, custom-mesh alias, dummy prompt processor."""

import jax
import numpy as np

import dreammat_tpu
import dreammat_tpu.models  # noqa: F401


def test_unified_sds_factory():
    g = dreammat_tpu.find("stable-diffusion-unified-guidance")(
        {
            "guidance_type": "sds", "model_size": "tiny",
            "half_precision_weights": False, "guidance_scale": 7.5,
            "width": 24, "height": 24, "cache_dir": None,
            # torch-mechanics keys the factory must absorb
            "enable_memory_efficient_attention": True,
            "token_merging": False,
        }
    )
    from dreammat_tpu.models.guidance_sds import StableDiffusionGuidance

    assert isinstance(g, StableDiffusionGuidance)
    assert g.cfg.guidance_scale == 7.5


def test_unified_vsd_factory():
    g = dreammat_tpu.find("stable-diffusion-unified-guidance")(
        {
            "guidance_type": "vsd", "model_size": "tiny",
            "half_precision_weights": False,
            "vsd_guidance_scale_phi": 2.0,
            "vsd_camera_condition_type": "extrinsics",
            "width": 24, "height": 24, "cache_dir": None,
        }
    )
    from dreammat_tpu.models.guidance_vsd import StableDiffusionVSDGuidance

    assert isinstance(g, StableDiffusionVSDGuidance)
    assert g.cfg.guidance_scale_lora == 2.0


def test_zero123_unified_factory(tmp_path):
    import pytest

    from PIL import Image

    p = str(tmp_path / "c_rgba.png")
    Image.fromarray(np.zeros((8, 8, 4), np.uint8), "RGBA").save(p)
    g = dreammat_tpu.find("zero123-unified-guidance")(
        {"guidance_type": "sds", "model_size": "tiny",
         "half_precision_weights": False, "cond_image_path": p,
         "width": 24, "height": 24}
    )
    from dreammat_tpu.models.guidance_zero123 import (
        Zero123Guidance, Zero123VSDGuidance,
    )

    assert isinstance(g, Zero123Guidance)
    gv = dreammat_tpu.find("zero123-unified-guidance")(
        {"guidance_type": "vsd", "model_size": "tiny",
         "half_precision_weights": False, "cond_image_path": p,
         "width": 24, "height": 24,
         "vsd_guidance_scale_phi": 2.0,
         "vsd_camera_condition_type": "spherical"}
    )
    assert isinstance(gv, Zero123VSDGuidance)
    assert gv.cfg.guidance_scale_phi == 2.0
    assert gv.cfg.camera_condition_type == "spherical"
    with pytest.raises(ValueError):
        dreammat_tpu.find("zero123-unified-guidance")({"guidance_type": "nope"})


def test_custom_mesh_alias():
    from dreammat_tpu.models.geometry import CustomMesh, DreamMatMesh

    assert dreammat_tpu.find("custom-mesh") is CustomMesh
    assert issubclass(CustomMesh, DreamMatMesh)


def test_dummy_prompt_processor():
    pp = dreammat_tpu.find("dummy-prompt-processor")({})
    pu = pp()
    assert pu.text.shape[-1] == 64  # tiny CLIP width
    # stable across calls (fixed seed) with view-dependent rows that differ
    # (so direction selection in guidances is exercised, not degenerate)
    pu2 = pp()
    import numpy as np

    assert np.array_equal(np.asarray(pu.text), np.asarray(pu2.text))
    vd = np.asarray(pu.text_vd)
    assert vd.shape[0] >= 2 and not np.allclose(vd[0], vd[1])


def test_triple_guidance_canny_and_grad():
    import jax.numpy as jnp

    g = dreammat_tpu.find("stable-diffusion-triple-guidance")(
        {
            "model_size": "tiny", "half_precision_weights": False,
            "use_controlnet": True, "control_types": ["depth", "canny"],
            "condition_scales": [1.0, 1.0],
            "condition_scales_anneal": [1.0, 1.0],
            "width": 24, "height": 24, "cache_dir": None,
            "controlnet_path": None,
        }
    )
    g.init_params(jax.random.PRNGKey(0), latent_hw=(12, 12))
    pp = dreammat_tpu.find("stable-diffusion-prompt-processor")(
        {"model_size": "tiny", "prompt": "a red apple", "use_cache": False}
    )
    pu = pp()
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 24, 24, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 24, 24, 4))
    args = (jnp.zeros((1,)), jnp.zeros((1,)), jnp.full((1,), 1.5))
    out = g(g.params, rgb, pu, *args, cond, step=0, rng=jax.random.PRNGKey(3))
    assert 0.0 <= float(out["loss_sds"]) < 1e6  # bounded subsumes finite
    grad = jax.grad(
        lambda x: g(g.params, x, pu, *args, cond, step=0,
                    rng=jax.random.PRNGKey(3))["loss_sds"]
    )(rgb)
    gmax = float(jnp.abs(grad).max())
    assert 0.0 < gmax < 1e4  # nonzero and bounded (subsumes finite)

    # canny preprocessing: an edge image has edges where the input steps
    from dreammat_tpu.models.guidance_triple import soft_canny

    img = jnp.zeros((1, 16, 16, 3)).at[:, :, 8:, :].set(1.0)
    e = soft_canny(img, 50, 100)
    assert float(e[0, 8, 8, 0]) > 0.5      # at the step edge
    assert float(e[0, 8, 2, 0]) == 0.0     # flat region


def test_triple_guidance_hed_control():
    import jax.numpy as jnp

    g = dreammat_tpu.find("stable-diffusion-triple-guidance")(
        {
            "model_size": "tiny", "half_precision_weights": False,
            "use_controlnet": True, "control_types": ["depth", "hed"],
            "condition_scales": [1.0, 1.0],
            "condition_scales_anneal": [1.0, 1.0],
            "width": 24, "height": 24, "cache_dir": None,
            "controlnet_path": None,
        }
    )
    assert g._hed is not None
    g.init_params(jax.random.PRNGKey(0), latent_hw=(12, 12))
    pp = dreammat_tpu.find("stable-diffusion-prompt-processor")(
        {"model_size": "tiny", "prompt": "a red apple", "use_cache": False}
    )
    pu = pp()
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 24, 24, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 24, 24, 4))
    args = (jnp.zeros((1,)), jnp.zeros((1,)), jnp.full((1,), 1.5))
    out = g(g.params, rgb, pu, *args, cond, step=0, rng=jax.random.PRNGKey(3))
    assert 0.0 <= float(out["loss_sds"]) < 1e6  # bounded subsumes finite
    # the HED-conditioned branch must contribute signal, not just not-NaN
    grad = jax.grad(
        lambda x: g(g.params, x, pu, *args, cond, step=0,
                    rng=jax.random.PRNGKey(3))["loss_sds"]
    )(rgb)
    assert float(jnp.abs(grad).max()) > 0

