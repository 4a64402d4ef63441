"""Weight conversion: diffusers/transformers torch checkpoints <-> Flax params.

Lets users bring the exact SD2.1 + geometry/light ControlNet weights the
reference uses (README.md:24 expects the ControlNet at ``model/controlnet``)
onto TPU, and export ControlNets trained here back into diffusers layout.

Conventions converted:
- Conv2d  torch [out,in,kh,kw]  <-> flax [kh,kw,in,out]
- Linear  torch [out,in]        <-> flax [in,out]
- Norms   weight/bias           <-> scale/bias
- Embed   weight                <-> embedding
plus the name-mangling between our flat module names (``down_blocks_0``)
and diffusers' dotted ones (``down_blocks.0``).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# names where diffusers itself uses an underscore+digit (do NOT dot-ify)
_PROTECTED = ("linear_1", "linear_2", "to_out_0_x")  # to_out handled below


def _t5_key(path: Tuple[str, ...]) -> str:
    """Our flax T5Encoder tree -> HF T5EncoderModel keys (t5.py layout:
    raw-param RMSNorm scales, shared relative_attention_bias at the top)."""
    if path == ("token_embedding", "embedding"):
        return "shared.weight"
    if path == ("relative_attention_bias",):
        return "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    if path == ("final_layer_norm",):
        return "encoder.final_layer_norm.weight"
    m = re.match(r"block_(\d+)", path[0])
    if m:
        n, rest = m.group(1), path[1:]
        if rest == ("attn_layer_norm",):
            return f"encoder.block.{n}.layer.0.layer_norm.weight"
        if rest == ("ff_layer_norm",):
            return f"encoder.block.{n}.layer.1.layer_norm.weight"
        if rest[0] == "attention":
            return f"encoder.block.{n}.layer.0.SelfAttention.{rest[1]}.weight"
        if rest[0] in ("wi_0", "wi_1", "wo"):
            return f"encoder.block.{n}.layer.1.DenseReluDense.{rest[0]}.weight"
    raise KeyError(f"unmapped t5 path {path}")


def _clip_vision_key(path: Tuple[str, ...]) -> str:
    """Our flax CLIPVisionModel tree -> HF CLIPVisionModelWithProjection
    keys (clip_vision.py layout). Note HF's literal 'pre_layrnorm' typo."""
    if path == ("patch_embedding", "kernel"):
        return "vision_model.embeddings.patch_embedding.weight"
    if path == ("class_embedding",):
        return "vision_model.embeddings.class_embedding"
    if path == ("position_embedding",):
        return "vision_model.embeddings.position_embedding.weight"
    if path[0] == "pre_layernorm":
        return f"vision_model.pre_layrnorm.{'weight' if path[1] == 'scale' else 'bias'}"
    if path[0] == "post_layernorm":
        return f"vision_model.post_layernorm.{'weight' if path[1] == 'scale' else 'bias'}"
    if path == ("visual_projection", "kernel"):
        return "visual_projection.weight"
    m = re.match(r"layers_(\d+)", path[0])
    if m:
        n, rest = m.group(1), path[1:]
        leaf = "weight" if rest[-1] in ("kernel", "scale") else "bias"
        mod = rest[0]
        if mod in ("q_proj", "k_proj", "v_proj", "out_proj"):
            mod = "self_attn." + mod
        elif mod in ("fc1", "fc2"):
            mod = "mlp." + mod
        return f"vision_model.encoder.layers.{n}.{mod}.{leaf}"
    raise KeyError(f"unmapped clip_vision path {path}")


def _flax_path_to_torch_key(path: Tuple[str, ...], model_type: str) -> str:
    if model_type == "t5":
        return _t5_key(path)
    if model_type == "clip_vision":
        return _clip_vision_key(path)
    *mods, leaf = path
    if model_type == "clip" and leaf == "position_embedding" and not mods:
        return "text_model.embeddings.position_embedding.weight"
    name = ".".join(mods)
    # protect diffusers' literal underscore names
    name = name.replace("linear_1", "linear<1>").replace("linear_2", "linear<2>")
    name = re.sub(r"_(\d+)", r".\1", name)
    name = name.replace("linear<1>", "linear_1").replace("linear<2>", "linear_2")
    # split compound flat names: ".0_resnets" -> ".0.resnets",
    # ".0_proj" -> ".0.proj" (ff.net), "mid_block_resnets" -> "mid_block.resnets"
    name = re.sub(r"(\.\d+)_", r"\1.", name)
    name = name.replace("mid_block_", "mid_block.")
    if model_type == "clip":
        name = _clip_rename(name)

    if leaf == "kernel":
        suffix = "weight"
    elif leaf == "scale":
        suffix = "weight"
    elif leaf == "embedding":
        suffix = "weight"
    else:
        suffix = leaf  # bias
    if name == "" :
        return suffix
    return f"{name}.{suffix}"


def _clip_rename(name: str) -> str:
    if name.startswith("token_embedding"):
        return "text_model.embeddings." + name
    if name.startswith("position_embedding"):
        return "text_model.embeddings." + name
    if name == "final_layer_norm":
        return "text_model.final_layer_norm"
    m = re.match(r"layers\.(\d+)\.(.*)", name)
    if m:
        idx, rest = m.group(1), m.group(2)
        if rest in ("q_proj", "k_proj", "v_proj", "out_proj"):
            rest = "self_attn." + rest
        elif rest in ("fc1", "fc2"):
            rest = "mlp." + rest
        return f"text_model.encoder.layers.{idx}.{rest}"
    return name


def _to_torch_array(leaf_name: str, value: np.ndarray) -> np.ndarray:
    if leaf_name == "kernel":
        if value.ndim == 4:  # conv: HWIO -> OIHW
            return np.transpose(value, (3, 2, 0, 1))
        if value.ndim == 2:  # dense: IO -> OI
            return np.transpose(value)
    return value


def _to_flax_array(leaf_name: str, flax_shape, value: np.ndarray) -> np.ndarray:
    if leaf_name == "kernel":
        if len(flax_shape) == 4:
            return np.transpose(value, (2, 3, 1, 0))
        if len(flax_shape) == 2:
            return np.transpose(value)
    return value.reshape(flax_shape)


# special-case fallbacks: older diffusers VAE attention naming
_VAE_ALIASES = (
    ("to_q", "query"), ("to_k", "key"), ("to_v", "value"), ("to_out.0", "proj_attn"),
)


def _lookup(sd: Dict[str, np.ndarray], key: str) -> Optional[np.ndarray]:
    if key in sd:
        return sd[key]
    for new, old in _VAE_ALIASES:
        if new in key:
            k2 = key.replace(new, old)
            if k2 in sd:
                return sd[k2]
    # CLIP: position embedding may lack trailing .weight in some exports
    if key.endswith("position_embedding.weight") and key[: -len(".weight")] in sd:
        return sd[key[: -len(".weight")]]
    return None


# torch-side tensors that are buffers/bookkeeping, not parameters — real
# exports may contain them and the converter must skip them silently
_KNOWN_BUFFERS = ("position_ids",)


def torch_to_flax_params(
    state_dict: Dict[str, Any],
    flax_params: Dict[str, Any],
    model_type: str = "unet",
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax param tree (template, e.g. from ``model.init``) with
    weights from a torch state dict. model_type in {unet, controlnet, vae, clip}.

    strict=True fails BOTH ways: on flax leaves with no torch key (missing)
    AND on torch keys no flax leaf consumed (unused, excluding known
    non-parameter buffers) — so a real checkpoint either loads 100% or
    errors loudly."""
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in state_dict.items()
    }
    used = set()
    missing = []

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    new_leaves = []
    for path, leaf in flat:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        if keys and keys[0] == "params":
            keys = keys[1:]
        tkey = _flax_path_to_torch_key(keys, model_type)
        val = _lookup(sd, tkey)
        if val is None:
            missing.append(tkey)
            new_leaves.append(leaf)
            continue
        used.add(tkey)
        arr = _to_flax_array(keys[-1], np.shape(leaf), val)
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {tkey}: {arr.shape} vs {np.shape(leaf)}")
        dtype = leaf.dtype if hasattr(leaf, "dtype") else jnp.asarray(leaf).dtype
        new_leaves.append(jnp.asarray(arr, dtype=dtype))
    if missing and strict:
        raise KeyError(f"missing {len(missing)} torch keys, e.g. {missing[:8]}")
    if strict:
        unused = [
            k for k in sd
            if k not in used and not any(b in k for b in _KNOWN_BUFFERS)
        ]
        # _lookup may consume a tensor under an alias name; count those too
        if unused:
            aliased = set()
            for k in used:
                for new, old in _VAE_ALIASES:
                    if new in k:
                        aliased.add(k.replace(new, old))
                if k.endswith("position_embedding.weight"):
                    aliased.add(k[: -len(".weight")])
            unused = [k for k in unused if k not in aliased]
        if unused:
            raise KeyError(
                f"{len(unused)} torch keys unconsumed, e.g. {sorted(unused)[:8]}"
            )
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def flax_key_shapes(flax_params: Dict[str, Any], model_type: str = "unet") -> Dict[str, Tuple[int, ...]]:
    """Map a flax param tree (arrays OR jax.eval_shape structs) to the torch
    key->shape dict its checkpoint counterpart must contain. Used by the
    manifest coverage test at full SD2.1 scale without materializing 5 GB."""
    out: Dict[str, Tuple[int, ...]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(flax_params)[0]:
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        if keys and keys[0] == "params":
            keys = keys[1:]
        shape = tuple(np.shape(leaf) if not hasattr(leaf, "shape") else leaf.shape)
        if keys[-1] == "kernel":
            if len(shape) == 4:  # HWIO -> OIHW
                shape = (shape[3], shape[2], shape[0], shape[1])
            elif len(shape) == 2:  # IO -> OI
                shape = (shape[1], shape[0])
        out[_flax_path_to_torch_key(keys, model_type)] = shape
    return out


def flax_to_torch_state_dict(flax_params: Dict[str, Any], model_type: str = "unet") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    for path, leaf in flat:
        keys = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        if keys and keys[0] == "params":
            keys = keys[1:]
        tkey = _flax_path_to_torch_key(keys, model_type)
        out[tkey] = _to_torch_array(keys[-1], np.asarray(leaf))
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pt (torch.load) or .safetensors checkpoint file."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # scannet.pt-style wrapper: {"model": state_dict} (NormalBae)
    if isinstance(sd, dict) and isinstance(sd.get("model"), dict):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items()}


def find_checkpoint_file(model_dir: str, names=("diffusion_pytorch_model", "model", "pytorch_model")) -> Optional[str]:
    for n in names:
        for ext in (".safetensors", ".bin", ".pt"):
            p = os.path.join(model_dir, n + ext)
            if os.path.exists(p):
                return p
    return None


def cast_float_leaves(tree, dtype):
    """Cast every floating-point leaf of a param tree to ``dtype``.

    Frozen diffusion weights are storage: with module compute dtype bf16,
    keeping them f32 (flax's default param_dtype) doubles the HBM weight
    traffic of every denoise step (~5 GB f32 vs ~2.5 GB bf16 for
    SD2.1 UNet+ControlNet+VAE — ~3 ms/step at v5e bandwidth) for no
    precision benefit: the reference stores fp16 weights outright
    (dreammat_guidance.py half_precision_weights). Norm scales/biases are
    upcast back to f32 at compute by their modules' dtype."""
    import jax.numpy as _jnp

    return jax.tree_util.tree_map(
        lambda l: l.astype(dtype) if _jnp.issubdtype(l.dtype, _jnp.floating) else l,
        tree,
    )


def fast_random_init(rng, init_fn):
    """Initialize flax params WITHOUT compiling the model's forward pass:
    ``jax.eval_shape(init_fn)`` gives the param structure, then each leaf is
    filled directly (normal(0, 0.02); norm scales = 1, biases = 0). For
    frozen diffusion weights that are either overwritten by a checkpoint or
    only benchmarked, this cuts minutes of XLA compile per model."""
    shapes = jax.eval_shape(init_fn)
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    treedef = jax.tree_util.tree_structure(shapes)
    leaves = []
    for i, (path, s) in enumerate(flat):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "scale":
            leaves.append(jnp.ones(s.shape, s.dtype))
        elif name == "bias":
            leaves.append(jnp.zeros(s.shape, s.dtype))
        else:
            k = jax.random.fold_in(rng, i)
            leaves.append(jax.random.normal(k, s.shape, jnp.float32).astype(s.dtype) * 0.02)
    return jax.tree_util.tree_unflatten(treedef, leaves)
