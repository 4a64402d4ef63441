"""VSD guidance (ProlificDreamer): LoRA merge semantics, gradient
isolation, camera conditioning, and a tiny end-to-end train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dreammat_tpu
import dreammat_tpu.models  # noqa: F401 (registry)
import dreammat_tpu.systems  # noqa: F401


# ------------------------------------------------------------------ lora ops
def test_lora_init_and_merge():
    from dreammat_tpu.models.diffusion import lora
    from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig

    unet = UNet2DCondition(UNetConfig.tiny())
    s, t, ctx = jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 4, 64))
    p = unet.init(jax.random.PRNGKey(0), s, t, ctx)
    # conv_out is zero-init (SD convention) => a fresh UNet outputs zeros;
    # give it weight so output deltas are observable
    p["params"]["conv_out"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), p["params"]["conv_out"]["kernel"].shape) * 0.05
    )
    lp = lora.init_lora_params(jax.random.PRNGKey(1), p, rank=4)
    # every site has zero initial delta (up == 0) -> merged == base
    merged = lora.merge_lora(p, lp, 1.0)
    e0, e1 = unet.apply(p, s, t, ctx), unet.apply(merged, s, t, ctx)
    assert np.allclose(np.asarray(e0), np.asarray(e1))
    # only attention projections are targeted, both attn1 and attn2
    assert all(k.split("/")[-1] in ("to_q", "to_k", "to_v", "to_out_0") for k in lp)
    assert any("attn1" in k for k in lp) and any("attn2" in k for k in lp)
    # non-zero factors change the output; scale=0 does not
    lp2 = jax.tree_util.tree_map(lambda a: a + 0.05, lp)
    e2 = unet.apply(lora.merge_lora(p, lp2, 1.0), s + 1.0, t, ctx)
    e3 = unet.apply(lora.merge_lora(p, lp2, 0.0), s + 1.0, t, ctx)
    e4 = unet.apply(p, s + 1.0, t, ctx)
    assert not np.allclose(np.asarray(e2), np.asarray(e4))
    assert np.allclose(np.asarray(e3), np.asarray(e4))


def test_class_embedding_conditioning():
    """class_labels shifts temb; zero labels with zero-init linears is a
    no-op, distinct labels give distinct outputs once the embedding has
    weights."""
    from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig

    unet = UNet2DCondition(UNetConfig.tiny())
    s = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    t, ctx = jnp.full((1,), 10.0), jnp.zeros((1, 4, 64))
    p = unet.init(jax.random.PRNGKey(0), s, t, ctx, class_labels=jnp.zeros((1, 16)))
    p["params"]["conv_out"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9), p["params"]["conv_out"]["kernel"].shape) * 0.05
    )
    ea = unet.apply(p, s, t, ctx, class_labels=jnp.zeros((1, 16)))
    eb = unet.apply(p, s, t, ctx, class_labels=jnp.ones((1, 16)) * 3.0)
    assert not np.allclose(np.asarray(ea), np.asarray(eb))


# ------------------------------------------------------------------ guidance
@pytest.fixture(scope="module")
def vsd_rig():
    g = dreammat_tpu.find("stable-diffusion-vsd-guidance")(
        {
            "model_size": "tiny", "half_precision_weights": False,
            "width": 32, "height": 32, "cache_dir": None,
            "guidance_scale": 7.5, "lora_rank": 2,
        }
    )
    g.init_params(jax.random.PRNGKey(0), latent_hw=(4, 4))
    lora = g.init_lora(jax.random.PRNGKey(1))
    pp = dreammat_tpu.find("stable-diffusion-prompt-processor")(
        {"model_size": "tiny", "prompt": "a red apple", "use_cache": False}
    )
    return g, lora, pp()


def _vsd_call(g, lora, pu, rgb, rng=jax.random.PRNGKey(7)):
    B = rgb.shape[0]
    return g(
        g.params, rgb, pu,
        jnp.zeros((B,)), jnp.zeros((B,)), jnp.full((B,), 1.5),
        c2w=jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
        lora_params=lora, step=0, rng=rng,
    )


def test_vsd_outputs(vsd_rig):
    g, lora, pu = vsd_rig
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    out = _vsd_call(g, lora, pu, rgb)
    for k in ("loss_vsd", "loss_lora", "grad_norm"):
        # bounded non-negative (subsumes finite: NaN fails the bound)
        assert 0.0 <= float(out[k]) < 1e6, k
    assert float(out["loss_lora"]) > 0.0


def test_vsd_gradient_isolation(vsd_rig):
    """loss_vsd only moves the image; loss_lora only moves the lora pytree."""
    g, lora, pu = vsd_rig
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))

    g_img = jax.grad(lambda x: _vsd_call(g, lora, pu, x)["loss_vsd"])(rgb)
    assert float(jnp.abs(g_img).max()) > 0.0

    g_img_from_lora_loss = jax.grad(lambda x: _vsd_call(g, lora, pu, x)["loss_lora"])(rgb)
    assert float(jnp.abs(g_img_from_lora_loss).max()) == 0.0  # latents detached

    g_lora_vsd = jax.grad(lambda lp: _vsd_call(g, lp, pu, rgb)["loss_vsd"])(lora)
    assert all(
        float(jnp.abs(a).max()) == 0.0
        for a in jax.tree_util.tree_leaves(g_lora_vsd)
    )  # eps nets stop-gradiented in the VSD grad

    g_lora = jax.grad(lambda lp: _vsd_call(g, lp, pu, rgb)["loss_lora"])(lora)
    # up factors are zero at init => down grads vanish; up grads must flow
    down_grads = [
        float(jnp.abs(v["down"]).max()) for v in g_lora["layers"].values()
    ]
    up_grads = [float(jnp.abs(v["up"]).max()) for v in g_lora["layers"].values()]
    assert max(down_grads) == 0.0
    assert max(up_grads) > 0.0
    cam_grads = [
        float(jnp.abs(a).max())
        for a in jax.tree_util.tree_leaves(g_lora["camera_embedding"])
    ]
    assert max(cam_grads) > 0.0


def test_vsd_camera_conditioning(vsd_rig):
    """After pushing the lora factors off zero, different c2w matrices give
    different VSD losses (the camera embedding is live)."""
    g, lora, pu = vsd_rig
    lora2 = jax.tree_util.tree_map(lambda a: a + 0.03, lora)
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))

    def call(c2w):
        return float(
            g(
                g.params, rgb, pu,
                jnp.zeros((1,)), jnp.zeros((1,)), jnp.full((1,), 1.5),
                c2w=c2w, lora_params=lora2, step=0,
                rng=jax.random.PRNGKey(7),
            )["loss_vsd"]
        )

    a = call(jnp.broadcast_to(jnp.eye(4), (1, 4, 4)))
    b = call(jnp.broadcast_to(jnp.eye(4) * 2.0, (1, 4, 4)))
    assert a != b


# ------------------------------------------------------------------- system
def test_prolificdreamer_trains(tmp_path):
    from dreammat_tpu.utils.config import load_config
    import os

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "prolificdreamer_tiny.yaml"),
        cli_args=[
            "system.prompt_processor.prompt=a red apple",
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
        {"geo": state["geo"], "bg": state["bg"], "lora": state["lora"]}
    )
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    # the lora up-factors moved off zero (its optimizer ran)
    ups = [float(jnp.abs(v["up"]).max()) for v in state["lora"]["layers"].values()]
    assert max(ups) > 0.0
    from conftest import assert_state_moved

    assert_state_moved(state, dreammat_tpu.find(cfg.system_type), cfg, dm,
                       keys=["geo"])


_DMTET_STAGE_ARGS = [
    "system.geometry_type=tetrahedra-sdf-grid",
    "system.geometry!={radius: 1.0, isosurface_resolution: 10, max_crossing_tets: 1024, shape_init: sphere, shape_init_params: 0.5, n_feature_dims: 3, pos_encoding_config: {otype: HashGrid, n_levels: 2, n_features_per_level: 2, log2_hashmap_size: 8, base_resolution: 4, per_level_scale: 1.5}, mlp_network_config: {n_neurons: 8, n_hidden_layers: 1}}",
    "system.renderer_type=nvdiff-rasterizer",
    "system.renderer!={radius: 1.0, sdf_opacity_samples: 8, face_chunk: 512}",
]


def test_prolificdreamer_geometry_stage_trains(tmp_path):
    """stage=geometry: DMTet mesh, guidance scored on comp_normal, with the
    normal-consistency + laplacian regularizers (reference
    prolificdreamer.py:47-52,104-117). Upstream uses plain SDS here."""
    from dreammat_tpu.utils.config import load_config
    import os

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "prolificdreamer_tiny.yaml"),
        cli_args=[
            "system.stage=geometry",
            "system.prompt_processor.prompt=a red apple",
            "system.guidance_type=stable-diffusion-guidance",
            "system.guidance!={model_size: tiny, half_precision_weights: false, width: 24, height: 24, cache_dir: null, guidance_scale: 100.0}",
            "system.loss!={lambda_sds: 1.0, lambda_normal_consistency: 100.0, lambda_laplacian_smoothness: 10.0}",
            *_DMTET_STAGE_ARGS,
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
    assert "lora" not in state  # plain SDS guidance: no phi optimizer
    p0 = system.geometry.init(jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(state["geo"]["sdf"]), np.asarray(p0["sdf"]))


def test_prolificdreamer_texture_stage_trains(tmp_path):
    """stage=texture: VSD on comp_rgb over the DMTet mesh, no extra
    regularizers (reference prolificdreamer.py:118-120)."""
    from dreammat_tpu.utils.config import load_config
    import os

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "prolificdreamer_tiny.yaml"),
        cli_args=[
            "system.stage=texture",
            "system.prompt_processor.prompt=a red apple",
            "system.loss!={lambda_vsd: 1.0, lambda_lora: 1.0}",
            *_DMTET_STAGE_ARGS,
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
    # texture stage trains the feature field + lora; geometry still updates
    # unless fix_geometry freezes it (upstream texture configs freeze it)
    leaves = jax.tree_util.tree_leaves(
        {"geo": state["geo"], "bg": state["bg"], "lora": state["lora"]}
    )
    # trained leaves bounded (subsumes finite: NaN fails the comparison)
    assert all(float(np.abs(np.asarray(l)).max()) < 1e6 for l in leaves)
    from conftest import assert_state_moved

    assert_state_moved(state, dreammat_tpu.find(cfg.system_type), cfg, dm,
                       keys=["geo"])
