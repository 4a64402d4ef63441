"""Synthesized diffusers/transformers checkpoint key manifests.

The image ships no SD weights, so real-checkpoint ingestion can't be tested
directly. These generators enumerate the EXACT state-dict key set (and
tensor shapes) a diffusers-layout SD2.1-base checkpoint contains — UNet,
VAE, text encoder — plus the 22-channel ControlNet the reference trains
(`diffusers.ControlNetModel.from_unet(unet, conditioning_channels=22)`,
/root/reference/controlnet_train/diffusers_train_controlnet.py:638).

IMPORTANT: this module is written against the *diffusers/transformers
architecture* (block types, per-block channel arithmetic, naming scheme) —
NOT against this repo's flax module trees — so the coverage test in
tests/test_weight_manifest.py is a genuine two-sided check: the converter
must map every manifest key onto a flax leaf and every flax leaf onto a
manifest key. Day-1 ingestion of a real checkpoint then reduces to shapes
already proven here.

Shapes use torch conventions: conv [out,in,kh,kw], linear [out,in],
norm/bias [C], embedding [num,dim].
"""

from __future__ import annotations

from typing import Dict, List, Tuple

Shape = Tuple[int, ...]
Manifest = Dict[str, Shape]


def _conv(m: Manifest, name: str, cout: int, cin: int, k: int) -> None:
    m[f"{name}.weight"] = (cout, cin, k, k)
    m[f"{name}.bias"] = (cout,)


def _linear(m: Manifest, name: str, cout: int, cin: int, bias: bool = True) -> None:
    m[f"{name}.weight"] = (cout, cin)
    if bias:
        m[f"{name}.bias"] = (cout,)


def _norm(m: Manifest, name: str, c: int) -> None:
    m[f"{name}.weight"] = (c,)
    m[f"{name}.bias"] = (c,)


def _resnet(m: Manifest, p: str, cin: int, cout: int, temb: int = 0) -> None:
    """diffusers ResnetBlock2D."""
    _norm(m, f"{p}.norm1", cin)
    _conv(m, f"{p}.conv1", cout, cin, 3)
    if temb:
        _linear(m, f"{p}.time_emb_proj", cout, temb)
    _norm(m, f"{p}.norm2", cout)
    _conv(m, f"{p}.conv2", cout, cout, 3)
    if cin != cout:
        _conv(m, f"{p}.conv_shortcut", cout, cin, 1)


def _transformer2d(m: Manifest, p: str, c: int, cross: int, depth: int = 1,
                   linear_proj: bool = True) -> None:
    """diffusers Transformer2DModel (use_linear_projection=True for SD2.x)."""
    _norm(m, f"{p}.norm", c)
    if linear_proj:
        _linear(m, f"{p}.proj_in", c, c)
        _linear(m, f"{p}.proj_out", c, c)
    else:
        _conv(m, f"{p}.proj_in", c, c, 1)
        _conv(m, f"{p}.proj_out", c, c, 1)
    for d in range(depth):
        b = f"{p}.transformer_blocks.{d}"
        _norm(m, f"{b}.norm1", c)
        _linear(m, f"{b}.attn1.to_q", c, c, bias=False)
        _linear(m, f"{b}.attn1.to_k", c, c, bias=False)
        _linear(m, f"{b}.attn1.to_v", c, c, bias=False)
        _linear(m, f"{b}.attn1.to_out.0", c, c)
        _norm(m, f"{b}.norm2", c)
        _linear(m, f"{b}.attn2.to_q", c, c, bias=False)
        _linear(m, f"{b}.attn2.to_k", c, cross, bias=False)
        _linear(m, f"{b}.attn2.to_v", c, cross, bias=False)
        _linear(m, f"{b}.attn2.to_out.0", c, c)
        _norm(m, f"{b}.norm3", c)
        _linear(m, f"{b}.ff.net.0.proj", c * 8, c)  # GEGLU: 2 * 4c
        _linear(m, f"{b}.ff.net.2", c, c * 4)


def _unet_down_mid(
    m: Manifest,
    block_out: Tuple[int, ...],
    layers_per_block: int,
    has_attn: Tuple[bool, ...],
    cross: int,
    temb: int,
    in_channels: int,
    linear_proj: bool = True,
) -> None:
    """Shared UNet/ControlNet trunk: conv_in + time_embedding + down + mid."""
    _conv(m, "conv_in", block_out[0], in_channels, 3)
    _linear(m, "time_embedding.linear_1", temb, block_out[0])
    _linear(m, "time_embedding.linear_2", temb, temb)
    ch = block_out[0]
    for i, cout in enumerate(block_out):
        p = f"down_blocks.{i}"
        for j in range(layers_per_block):
            _resnet(m, f"{p}.resnets.{j}", ch if j == 0 else cout, cout, temb)
            if has_attn[i]:
                _transformer2d(m, f"{p}.attentions.{j}", cout, cross,
                               linear_proj=linear_proj)
        if i != len(block_out) - 1:
            _conv(m, f"{p}.downsamplers.0.conv", cout, cout, 3)
        ch = cout
    c = block_out[-1]
    _resnet(m, "mid_block.resnets.0", c, c, temb)
    _transformer2d(m, "mid_block.attentions.0", c, cross,
                   linear_proj=linear_proj)
    _resnet(m, "mid_block.resnets.1", c, c, temb)


def unet_manifest(
    in_channels: int = 4,
    out_channels: int = 4,
    block_out: Tuple[int, ...] = (320, 640, 1280, 1280),
    layers_per_block: int = 2,
    has_attn: Tuple[bool, ...] = (True, True, True, False),
    cross: int = 1024,
    linear_proj: bool = True,
) -> Manifest:
    """diffusers UNet2DConditionModel (SD2.1-base config; SD1.x-style
    models — zero123/ip2p — use conv projections, linear_proj=False)."""
    m: Manifest = {}
    temb = block_out[0] * 4
    _unet_down_mid(m, block_out, layers_per_block, has_attn, cross, temb,
                   in_channels, linear_proj=linear_proj)

    # up path: diffusers UNet2DConditionModel.__init__ channel arithmetic
    rev = list(reversed(block_out))
    rev_attn = list(reversed(has_attn))
    output_channel = rev[0]
    for i in range(len(block_out)):
        prev_output = output_channel
        output_channel = rev[i]
        input_channel = rev[min(i + 1, len(block_out) - 1)]
        is_final = i == len(block_out) - 1
        p = f"up_blocks.{i}"
        for j in range(layers_per_block + 1):
            res_skip = input_channel if j == layers_per_block else output_channel
            res_in = prev_output if j == 0 else output_channel
            _resnet(m, f"{p}.resnets.{j}", res_in + res_skip, output_channel, temb)
            if rev_attn[i]:
                _transformer2d(m, f"{p}.attentions.{j}", output_channel, cross,
                               linear_proj=linear_proj)
        if not is_final:
            _conv(m, f"{p}.upsamplers.0.conv", output_channel, output_channel, 3)

    _norm(m, "conv_norm_out", block_out[0])
    _conv(m, "conv_out", out_channels, block_out[0], 3)
    return m


def controlnet_manifest(
    conditioning_channels: int = 22,
    cond_embed: Tuple[int, ...] = (16, 32, 96, 256),
    block_out: Tuple[int, ...] = (320, 640, 1280, 1280),
    layers_per_block: int = 2,
    has_attn: Tuple[bool, ...] = (True, True, True, False),
    cross: int = 1024,
) -> Manifest:
    """diffusers ControlNetModel.from_unet(unet, conditioning_channels=N)."""
    m: Manifest = {}
    temb = block_out[0] * 4
    _unet_down_mid(m, block_out, layers_per_block, has_attn, cross, temb, 4)

    # ControlNetConditioningEmbedding
    ce = "controlnet_cond_embedding"
    _conv(m, f"{ce}.conv_in", cond_embed[0], conditioning_channels, 3)
    for i in range(len(cond_embed) - 1):
        _conv(m, f"{ce}.blocks.{2 * i}", cond_embed[i], cond_embed[i], 3)
        _conv(m, f"{ce}.blocks.{2 * i + 1}", cond_embed[i + 1], cond_embed[i], 3)
    _conv(m, f"{ce}.conv_out", block_out[0], cond_embed[-1], 3)

    # zero convs: one per down residual (conv_in + layers_per_block per block
    # + one downsample per non-final block), plus the mid block
    idx = 0
    _conv(m, f"controlnet_down_blocks.{idx}", block_out[0], block_out[0], 1)
    idx += 1
    for i, cout in enumerate(block_out):
        for _ in range(layers_per_block):
            _conv(m, f"controlnet_down_blocks.{idx}", cout, cout, 1)
            idx += 1
        if i != len(block_out) - 1:
            _conv(m, f"controlnet_down_blocks.{idx}", cout, cout, 1)
            idx += 1
    _conv(m, "controlnet_mid_block", block_out[-1], block_out[-1], 1)
    return m


def vae_manifest(
    in_channels: int = 3,
    latent: int = 4,
    block_out: Tuple[int, ...] = (128, 256, 512, 512),
    layers_per_block: int = 2,
) -> Manifest:
    """diffusers AutoencoderKL (SD 1.x/2.x VAE config)."""
    m: Manifest = {}

    def attention(p: str, c: int) -> None:
        _norm(m, f"{p}.group_norm", c)
        _linear(m, f"{p}.to_q", c, c)
        _linear(m, f"{p}.to_k", c, c)
        _linear(m, f"{p}.to_v", c, c)
        _linear(m, f"{p}.to_out.0", c, c)

    # encoder
    _conv(m, "encoder.conv_in", block_out[0], in_channels, 3)
    ch = block_out[0]
    for i, cout in enumerate(block_out):
        p = f"encoder.down_blocks.{i}"
        for j in range(layers_per_block):
            _resnet(m, f"{p}.resnets.{j}", ch if j == 0 else cout, cout)
        if i != len(block_out) - 1:
            _conv(m, f"{p}.downsamplers.0.conv", cout, cout, 3)
        ch = cout
    c = block_out[-1]
    _resnet(m, "encoder.mid_block.resnets.0", c, c)
    attention("encoder.mid_block.attentions.0", c)
    _resnet(m, "encoder.mid_block.resnets.1", c, c)
    _norm(m, "encoder.conv_norm_out", c)
    _conv(m, "encoder.conv_out", 2 * latent, c, 3)

    # decoder
    _conv(m, "decoder.conv_in", block_out[-1], latent, 3)
    _resnet(m, "decoder.mid_block.resnets.0", c, c)
    attention("decoder.mid_block.attentions.0", c)
    _resnet(m, "decoder.mid_block.resnets.1", c, c)
    rev = list(reversed(block_out))
    ch = rev[0]
    for i, cout in enumerate(rev):
        p = f"decoder.up_blocks.{i}"
        for j in range(layers_per_block + 1):
            _resnet(m, f"{p}.resnets.{j}", ch if j == 0 else cout, cout)
        if i != len(rev) - 1:
            _conv(m, f"{p}.upsamplers.0.conv", cout, cout, 3)
        ch = cout
    _norm(m, "decoder.conv_norm_out", block_out[0])
    _conv(m, "decoder.conv_out", in_channels, block_out[0], 3)

    _conv(m, "quant_conv", 2 * latent, 2 * latent, 1)
    _conv(m, "post_quant_conv", latent, latent, 1)
    return m


# Non-parameter buffers present in some transformers exports of the text
# encoder; real checkpoints may or may not contain them and the converter
# must skip them without error.
CLIP_OPTIONAL_BUFFERS = {"text_model.embeddings.position_ids": (1, 77)}


def clip_text_manifest(
    vocab: int = 49408,
    hidden: int = 1024,
    intermediate: int = 4096,
    layers: int = 23,
    max_pos: int = 77,
) -> Manifest:
    """transformers CLIPTextModel (SD2.1 ships the OpenCLIP ViT-H text tower
    as a 23-layer CLIPTextModel)."""
    m: Manifest = {}
    m["text_model.embeddings.token_embedding.weight"] = (vocab, hidden)
    m["text_model.embeddings.position_embedding.weight"] = (max_pos, hidden)
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        _norm(m, f"{p}.layer_norm1", hidden)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(m, f"{p}.self_attn.{proj}", hidden, hidden)
        _norm(m, f"{p}.layer_norm2", hidden)
        _linear(m, f"{p}.mlp.fc1", intermediate, hidden)
        _linear(m, f"{p}.mlp.fc2", hidden, intermediate)
    _norm(m, "text_model.final_layer_norm", hidden)
    return m
