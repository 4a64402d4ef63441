"""InstructPix2Pix guidance + multiview datamodule + Instruct-NeRF2NeRF."""

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


def _make_scene(root, n_frames=3, hw=32):
    """Tiny nerfstudio-style capture: colored frames on a camera circle."""
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    frames = []
    for i in range(n_frames):
        a = 2 * np.pi * i / n_frames
        pos = np.asarray([2 * np.cos(a), 2 * np.sin(a), 0.5])
        fwd = -pos / np.linalg.norm(pos)
        up = np.asarray([0.0, 0.0, 1.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        c2w = np.eye(4)
        # OPENCV convention: x right, y down, z forward
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, -up2, fwd, pos
        img = np.full((hw, hw, 3), 40 * (i + 1), np.uint8)
        p = f"images/frame_{i}.png"
        Image.fromarray(img).save(os.path.join(root, p))
        frames.append({
            "file_path": p, "transform_matrix": c2w.tolist(),
            "w": hw, "h": hw,
            "fl_x": hw * 1.2, "fl_y": hw * 1.2, "cx": hw / 2, "cy": hw / 2,
        })
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"camera_model": "OPENCV", "frames": frames}, f)
    return root


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return _make_scene(str(tmp_path_factory.mktemp("mv")))


def test_multiview_datamodule(scene):
    dm = dreammat_tpu.find("multiview-camera-datamodule")(
        {"dataroot": scene, "train_downsample_resolution": 2,
         "eval_downsample_resolution": 2}, None, None,
    )
    dm.setup()
    assert dm.n_frames == 3
    b = dm.collate(0)
    assert b["rays_o"].shape == (16 * 16, 3)
    assert b["gt_rgb"].shape == (16, 16, 3)
    # rays point roughly at the origin-centered scene
    d = np.asarray(b["rays_d"]).reshape(16, 16, 3)[8, 8]
    o = np.asarray(b["rays_o"])[0]
    assert np.dot(d, -o / np.linalg.norm(o)) > 0.8
    ev = dm.eval_rays(1)
    assert ev["rays_o"].shape == (16, 16, 3)
    # interpolated eval path
    dm2 = dreammat_tpu.find("multiview-camera-datamodule")(
        {"dataroot": scene, "train_downsample_resolution": 2,
         "eval_interpolation": (0, 1, 4)}, None, None,
    )
    dm2.setup()
    ev2 = dm2.eval_rays(2)
    # eval ray directions are unit vectors (stronger than finite)
    import numpy as _np
    _np.testing.assert_allclose(
        _np.linalg.norm(_np.asarray(ev2["rays_d"]), axis=-1), 1.0, atol=1e-4)


@pytest.fixture(scope="module")
def ip2p():
    g = dreammat_tpu.find("stable-diffusion-instructpix2pix-guidance")(
        {"model_size": "tiny", "half_precision_weights": False,
         "diffusion_steps": 4, "fixed_size": 16}
    )
    g.init_params(jax.random.PRNGKey(0), latent_hw=(8, 8))
    return g


@pytest.fixture(scope="module")
def prompts():
    pp = dreammat_tpu.find("stable-diffusion-prompt-processor")(
        {"model_size": "tiny", "prompt": "make it a painting",
         "use_cache": False}
    )
    return pp()


def test_ip2p_edit_mode(ip2p, prompts):
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    out = ip2p(ip2p.params, rgb, cond, prompts, step=0, rng=jax.random.PRNGKey(3))
    assert out["edit_images"].shape == (1, 16, 16, 3)
    a = np.asarray(out["edit_images"])
    # [0,1] range subsumes finiteness (NaN fails both comparisons)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_ip2p_sds_mode(prompts):
    g = dreammat_tpu.find("stable-diffusion-instructpix2pix-guidance")(
        {"model_size": "tiny", "half_precision_weights": False,
         "use_sds": True, "fixed_size": 16}
    )
    g.init_params(jax.random.PRNGKey(0), latent_hw=(8, 8))
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    grad = jax.grad(
        lambda x: g(g.params, x, cond, prompts, step=0,
                    rng=jax.random.PRNGKey(3))["loss_sds"]
    )(rgb)
    gmax = float(jnp.abs(grad).max())
    assert 0.0 < gmax < 1e4  # nonzero and bounded (subsumes finite)


def test_perceptual_distance():
    from dreammat_tpu.utils import perceptual

    params = perceptual.init_vgg16(jax.random.PRNGKey(0), cache_dir=None)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    d_same = float(perceptual.perceptual_distance(params, x, x))
    d_diff = float(perceptual.perceptual_distance(params, x, y))
    assert d_same < 1e-6
    assert d_diff > d_same
    g = jax.grad(lambda a: perceptual.perceptual_distance(params, a, y))(x)
    # distance must increase moving x away from y along the gradient
    gmax = float(jnp.abs(np.asarray(g)).max())
    assert 0.0 < gmax < 1e6


def test_in2n_system_trains(scene, tmp_path):
    from dreammat_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "dreamfusion_tiny.yaml"),
        cli_args=[
            "system_type=instructnerf2nerf-system",
            "data_type=multiview-camera-datamodule",
            f"data!={{dataroot: {scene}, train_downsample_resolution: 2}}",
            "system.prompt_processor.prompt=make it a painting",
            "system.guidance_type=stable-diffusion-instructpix2pix-guidance",
            "system.guidance!={model_size: tiny, half_precision_weights: false, diffusion_steps: 2, fixed_size: 16}",
            "system.per_editing_step=1",
            "system.start_editing_step=0",
            "system.loss!={lambda_l1: 10.0, lambda_p: 1.0, lambda_orient: 0.0, lambda_sparsity: 0.0, lambda_opaque: 0.0}",
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
    # editing kicked in: at least one frame target was replaced
    assert len(system.edit_frames) >= 1
    leaves = jax.tree_util.tree_leaves(state["geo"])
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    from conftest import assert_state_moved

    assert_state_moved(state, dreammat_tpu.find(cfg.system_type), cfg, dm,
                       keys=["geo"])
