"""Round-trip tests: flax params -> torch-layout state dict -> flax params.

This verifies the name mangling and tensor transposes in both directions
without needing real SD weights (none in the image)."""

import jax
import jax.numpy as jnp
import numpy as np

from dreammat_tpu.models.diffusion import convert
from dreammat_tpu.models.diffusion.clip_text import CLIPTextConfig, CLIPTextModel
from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig


def _roundtrip(params, model_type):
    sd = convert.flax_to_torch_state_dict(params, model_type)
    # scramble: convert back into a zeroed template of the same structure
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    back = convert.torch_to_flax_params(sd, template, model_type, strict=True)
    leaves_a = jax.tree_util.tree_leaves(params)
    leaves_b = jax.tree_util.tree_leaves(back)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        assert a.shape == b.shape
        assert np.allclose(np.asarray(a), np.asarray(b))
    return sd


def test_unet_roundtrip_and_key_style():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)), jnp.zeros((1, 4, cfg.cross_attention_dim)),
    )
    sd = _roundtrip(params, "unet")
    keys = set(sd.keys())
    # spot-check diffusers-style key names
    assert "conv_in.weight" in keys
    assert "time_embedding.linear_1.weight" in keys
    assert "down_blocks.0.resnets.0.conv1.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_q.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight" in keys
    assert "mid_block.attentions.0.proj_in.weight" in keys
    assert "conv_out.weight" in keys
    # conv layout is OIHW in the torch view
    w = sd["conv_in.weight"]
    assert w.shape == (cfg.block_out_channels[0], 4, 3, 3)


def test_controlnet_roundtrip():
    ccfg = ControlNetConfig.tiny()
    model = ControlNet(ccfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 4, ccfg.unet.cross_attention_dim)),
        jnp.zeros((1, 16, 16, ccfg.conditioning_channels)),
    )
    sd = _roundtrip(params, "controlnet")
    assert "controlnet_cond_embedding.conv_in.weight" in sd
    assert "controlnet_cond_embedding.blocks.0.weight" in sd
    assert "controlnet_down_blocks.0.weight" in sd
    assert "controlnet_mid_block.weight" in sd
    # 22-channel conditioning stem in torch layout [out, 22, 3, 3]
    assert sd["controlnet_cond_embedding.conv_in.weight"].shape[1] == 22


def test_vae_roundtrip():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sd = _roundtrip(params, "vae")
    assert "encoder.conv_in.weight" in sd
    assert "encoder.down_blocks.0.resnets.0.conv1.weight" in sd
    assert "encoder.mid_block.attentions.0.to_q.weight" in sd
    assert "decoder.up_blocks.0.resnets.0.conv1.weight" in sd
    assert "quant_conv.weight" in sd
    assert "post_quant_conv.weight" in sd


def test_clip_roundtrip():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), dtype=jnp.int32))
    sd = _roundtrip(params, "clip")
    assert "text_model.embeddings.token_embedding.weight" in sd
    assert "text_model.embeddings.position_embedding.weight" in sd
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "text_model.encoder.layers.0.mlp.fc1.weight" in sd
    assert "text_model.final_layer_norm.weight" in sd


def test_vae_old_attention_alias():
    """Older diffusers VAEs name attention query/key/value/proj_attn."""
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sd = convert.flax_to_torch_state_dict(params, "vae")
    renamed = {}
    for k, v in sd.items():
        for new, old in convert._VAE_ALIASES:
            if new in k:
                k = k.replace(new, old)
                break
        renamed[k] = v
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    back = convert.torch_to_flax_params(renamed, template, "vae", strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        assert np.allclose(np.asarray(a), np.asarray(b))
