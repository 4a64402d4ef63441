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
    from dreammat_tpu.models.guidance_zero123 import Zero123Guidance

    assert isinstance(g, Zero123Guidance)
    with pytest.raises(NotImplementedError):
        dreammat_tpu.find("zero123-unified-guidance")({"guidance_type": "vsd"})


def test_custom_mesh_alias():
    from dreammat_tpu.models.geometry import CustomMesh, DreamMatMesh

    assert dreammat_tpu.find("custom-mesh") is CustomMesh
    assert issubclass(CustomMesh, DreamMatMesh)


def test_dummy_prompt_processor():
    pp = dreammat_tpu.find("dummy-prompt-processor")({})
    pu = pp()
    assert pu.text.shape[-1] == 64  # tiny CLIP width
