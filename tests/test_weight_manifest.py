"""Real-checkpoint ingestion proof without real weights (VERDICT r1 #8).

models/diffusion/manifest.py enumerates the diffusers/transformers state
dict (key names + torch shapes) for SD2.1-base UNet/VAE/text-encoder and
the 22-channel ControlNet — written from the diffusers architecture, NOT
from this repo's flax trees. These tests then require the converter
(models/diffusion/convert.py) to be a bijection between that manifest and
the flax param tree:

1. full-scale key/shape coverage in both directions (via jax.eval_shape —
   no 5 GB materialization), and
2. a numeric strict-mode roundtrip at tiny scale, including a .safetensors
   fixture when safetensors is available.

Reference consumption sites: dreammat_guidance.py:110-154 (loads the real
SD pipe), diffusers_train_controlnet.py:580-638 (saves the ControlNet).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreammat_tpu.models.diffusion import convert, manifest
from dreammat_tpu.models.diffusion.clip_text import CLIPTextConfig, CLIPTextModel
from dreammat_tpu.models.diffusion.controlnet import ControlNet, ControlNetConfig
from dreammat_tpu.models.diffusion.unet import UNet2DCondition, UNetConfig
from dreammat_tpu.models.diffusion.vae import AutoencoderKL, VAEConfig


def _assert_bijection(flax_shapes, man, optional=()):
    missing = sorted(set(man) - set(flax_shapes))
    extra = sorted(set(flax_shapes) - set(man) - set(optional))
    assert not missing, f"{len(missing)} manifest keys unmapped, e.g. {missing[:8]}"
    assert not extra, f"{len(extra)} flax keys outside manifest, e.g. {extra[:8]}"
    bad = [
        (k, flax_shapes[k], man[k])
        for k in man
        if tuple(flax_shapes[k]) != tuple(man[k])
    ]
    assert not bad, f"{len(bad)} shape mismatches, e.g. {bad[:4]}"


class TestFullScaleCoverage:
    """Key+shape bijection at real SD2.1-base scale (shapes only)."""

    def test_unet_sd21(self):
        cfg = UNetConfig.sd21()
        tpl = jax.eval_shape(
            lambda: UNet2DCondition(cfg).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                jnp.zeros((1, 4, 1024)),
            )
        )
        flax_shapes = convert.flax_key_shapes(tpl, "unet")
        man = manifest.unet_manifest()
        assert len(man) == 686  # SD2.1-base UNet tensor count
        _assert_bijection(flax_shapes, man)

    def test_controlnet_22ch(self):
        cfg = ControlNetConfig(unet=UNetConfig.sd21(), conditioning_channels=22)
        tpl = jax.eval_shape(
            lambda: ControlNet(cfg).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                jnp.zeros((1, 4, 1024)), jnp.zeros((1, 64, 64, 22)),
            )
        )
        flax_shapes = convert.flax_key_shapes(tpl, "controlnet")
        man = manifest.controlnet_manifest(conditioning_channels=22)
        _assert_bijection(flax_shapes, man)
        # the 22-channel stem is the nonstandard part — pin it explicitly
        assert man["controlnet_cond_embedding.conv_in.weight"] == (16, 22, 3, 3)
        assert man["controlnet_mid_block.weight"] == (1280, 1280, 1, 1)
        assert sum("controlnet_down_blocks" in k and k.endswith("weight") for k in man) == 12

    def test_vae_sd(self):
        tpl = jax.eval_shape(
            lambda: AutoencoderKL(VAEConfig.sd()).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
            )
        )
        flax_shapes = convert.flax_key_shapes(tpl, "vae")
        man = manifest.vae_manifest()
        assert len(man) == 248  # SD VAE tensor count
        _assert_bijection(flax_shapes, man)

    def test_clip_text_sd21(self):
        tpl = jax.eval_shape(
            lambda: CLIPTextModel(CLIPTextConfig.sd21()).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
            )
        )
        flax_shapes = convert.flax_key_shapes(tpl, "clip")
        man = manifest.clip_text_manifest()
        assert len(man) == 2 + 23 * 16 + 2
        _assert_bijection(flax_shapes, man)


def _tiny_models():
    ucfg = UNetConfig.tiny()
    unet_man = manifest.unet_manifest(
        block_out=ucfg.block_out_channels, layers_per_block=ucfg.layers_per_block,
        has_attn=ucfg.down_block_has_attn, cross=ucfg.cross_attention_dim,
    )
    unet_tpl = UNet2DCondition(ucfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 4, ucfg.cross_attention_dim)),
    )
    ccfg = ControlNetConfig.tiny()
    cnet_man = manifest.controlnet_manifest(
        conditioning_channels=22, cond_embed=ccfg.conditioning_embedding_channels,
        block_out=ucfg.block_out_channels, layers_per_block=ucfg.layers_per_block,
        has_attn=ucfg.down_block_has_attn, cross=ucfg.cross_attention_dim,
    )
    ccfg = ControlNetConfig(
        unet=ucfg, conditioning_channels=22,
        conditioning_embedding_channels=ccfg.conditioning_embedding_channels,
    )
    cnet_tpl = ControlNet(ccfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 4, ucfg.cross_attention_dim)),
        jnp.zeros((1, 8, 8, 22)),  # tiny stem has one stride-2 conv (/2)
    )
    return [("unet", unet_man, unet_tpl), ("controlnet", cnet_man, cnet_tpl)]


def _synth_state_dict(man, seed=0):
    rs = np.random.RandomState(seed)
    return {k: rs.randn(*s).astype(np.float32) for k, s in man.items()}


class TestNumericStrictRoundtrip:
    """strict=True ingestion of a manifest-shaped checkpoint + roundtrip."""

    @pytest.mark.parametrize("which", [0, 1])
    def test_strict_load_and_roundtrip(self, which):
        mtype, man, tpl = _tiny_models()[which]
        sd = _synth_state_dict(man)
        params = convert.torch_to_flax_params(sd, tpl, mtype, strict=True)
        back = convert.flax_to_torch_state_dict(params, mtype)
        assert set(back) == set(man)
        for k in man:
            np.testing.assert_allclose(back[k], sd[k], rtol=0, atol=0)

    def test_strict_rejects_missing_and_unused(self):
        mtype, man, tpl = _tiny_models()[0]
        sd = _synth_state_dict(man)
        k0 = sorted(man)[0]
        sd_missing = {k: v for k, v in sd.items() if k != k0}
        with pytest.raises(KeyError, match="missing"):
            convert.torch_to_flax_params(sd_missing, tpl, mtype, strict=True)
        sd_extra = dict(sd, **{"lora.alpha.weight": np.zeros((1,), np.float32)})
        with pytest.raises(KeyError, match="unconsumed"):
            convert.torch_to_flax_params(sd_extra, tpl, mtype, strict=True)

    def test_position_ids_buffer_skipped(self):
        """transformers exports may carry the position_ids buffer; the
        converter must ignore it (manifest.CLIP_OPTIONAL_BUFFERS)."""
        ccfg = CLIPTextConfig.tiny()
        man = manifest.clip_text_manifest(
            vocab=ccfg.vocab_size, hidden=ccfg.hidden_size,
            intermediate=ccfg.intermediate_size, layers=ccfg.num_layers,
            max_pos=ccfg.max_length,
        )
        tpl = CLIPTextModel(ccfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, ccfg.max_length), jnp.int32)
        )
        sd = _synth_state_dict(man)
        sd["text_model.embeddings.position_ids"] = np.arange(
            ccfg.max_length, dtype=np.int64
        )[None]
        params = convert.torch_to_flax_params(sd, tpl, "clip", strict=True)
        back = convert.flax_to_torch_state_dict(params, "clip")
        assert set(back) == set(man)

    def test_safetensors_fixture(self, tmp_path):
        pytest.importorskip("safetensors")
        from safetensors.numpy import save_file

        mtype, man, tpl = _tiny_models()[0]
        sd = _synth_state_dict(man)
        p = str(tmp_path / "diffusion_pytorch_model.safetensors")
        save_file(sd, p)
        loaded = convert.load_torch_state_dict(p)
        params = convert.torch_to_flax_params(loaded, tpl, mtype, strict=True)
        back = convert.flax_to_torch_state_dict(params, mtype)
        for k in man:
            np.testing.assert_allclose(back[k], sd[k])


class TestImageConditionedUNets:
    """Key+shape bijection for the SD1.x-style UNets of the image
    families: zero123 (8-ch input, 768 cross, conv projections) and
    InstructPix2Pix (same shape class) — day-1 ingestion for those
    checkpoints is the same file-drop exercise as SD2.1."""

    def _check(self, ucfg, cross, in_ch, out_ch):
        tpl = jax.eval_shape(
            lambda: UNet2DCondition(ucfg).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, in_ch)),
                jnp.zeros((1,)), jnp.zeros((1, 4, cross)),
            )
        )
        flax_shapes = convert.flax_key_shapes(tpl, "unet")
        man = manifest.unet_manifest(
            in_channels=in_ch, out_channels=out_ch,
            cross=cross, linear_proj=False,
        )
        _assert_bijection(flax_shapes, man)

    def test_zero123_unet(self):
        from dreammat_tpu.models.guidance_zero123 import zero123_unet_config

        self._check(zero123_unet_config(), 768, 8, 4)

    def test_ip2p_unet(self):
        from dreammat_tpu.models.guidance_ip2p import ip2p_unet_config

        self._check(ip2p_unet_config(), 768, 8, 4)
