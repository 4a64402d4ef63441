"""Unified guidance config surfaces (SDS/VSD behind one name).

The reference's ``stable-diffusion-unified-guidance``
(/root/reference/threestudio_dreammat/threestudio/models/guidance/
stable_diffusion_unified_guidance.py:31-724) and
``zero123-unified-guidance`` (.../zero123_unified_guidance.py) are single
classes that branch on ``cfg.guidance_type in ["sds", "vsd"]`` at every
call site. This framework keeps SDS and VSD as separate, individually
jitted guidances (guidance_sds.py, guidance_vsd.py, guidance_zero123.py)
— cleaner tracing, no dead branches in the compiled step — and exposes
the unified names as config-translation FACTORIES: the registry entry is
a callable that reads the unified surface and constructs the right
underlying guidance with translated keys. Unknown unified-only knobs are
warned about and dropped (documented; they configure torch-side
mechanics like xformers/token-merging that have no TPU analog).
"""

from __future__ import annotations

import dreammat_tpu

# unified key -> (sds key, vsd key); None = not applicable
_COMMON_KEYS = (
    "pretrained_model_name_or_path", "guidance_scale",
    "half_precision_weights", "min_step_percent", "max_step_percent",
    "view_dependent_prompting", "weighting_strategy", "width", "height",
    "cache_dir", "model_size",
)
_VSD_MAP = {
    "vsd_guidance_scale_phi": "guidance_scale_lora",
    "vsd_lora_cfg_training": "lora_cfg_training",
    "vsd_lora_n_timestamp_samples": "lora_n_timestamp_samples",
    "vsd_camera_condition_type": "camera_condition_type",
}


def _translate(cfg: dict, mode: str) -> dict:
    out = {}
    dropped = []
    for k, v in dict(cfg).items():
        if k == "guidance_type":
            continue
        if k in _COMMON_KEYS:
            out[k] = v
        elif k == "grad_clip":
            out["grad_clip_val"] = v if not isinstance(v, (list, tuple)) else v[1]
        elif mode == "vsd" and k in _VSD_MAP:
            out[_VSD_MAP[k]] = v
        elif k.startswith("vsd_") and mode != "vsd":
            continue  # vsd-only knobs are inert in sds mode (reference too)
        else:
            dropped.append(k)
    if dropped:
        dreammat_tpu.info(
            "unified guidance: ignoring torch-mechanics keys %s", dropped
        )
    return out


@dreammat_tpu.register("stable-diffusion-unified-guidance")
def stable_diffusion_unified_guidance(cfg):
    cfg = dict(cfg or {})
    mode = cfg.get("guidance_type", "sds")
    if mode == "sds":
        return dreammat_tpu.find("stable-diffusion-guidance")(
            _translate(cfg, "sds")
        )
    if mode == "vsd":
        return dreammat_tpu.find("stable-diffusion-vsd-guidance")(
            _translate(cfg, "vsd")
        )
    raise ValueError(f"unknown unified guidance_type {mode!r}")


_Z123_VSD_MAP = {
    "vsd_guidance_scale_phi": "guidance_scale_phi",
    "vsd_lora_cfg_training": "lora_cfg_training",
    "vsd_lora_n_timestamp_samples": "lora_n_timestamp_samples",
    "vsd_camera_condition_type": "camera_condition_type",
}


@dreammat_tpu.register("zero123-unified-guidance")
def zero123_unified_guidance(cfg):
    cfg = dict(cfg or {})
    mode = cfg.get("guidance_type", "sds")
    if mode not in ("sds", "vsd"):
        raise ValueError(f"unknown zero123-unified guidance_type {mode!r}")
    keep = (
        "pretrained_model_name_or_path", "guidance_scale",
        "half_precision_weights", "min_step_percent", "max_step_percent",
        "cond_image_path", "cond_elevation_deg", "cond_azimuth_deg",
        "cond_camera_distance", "model_size", "width", "height",
    )
    out = {}
    dropped = []
    for k, v in cfg.items():
        if k == "guidance_type":
            continue
        if k in keep:
            out[k] = v
        elif k == "grad_clip":
            out["grad_clip"] = v
        elif mode == "vsd" and k in _Z123_VSD_MAP:
            out[_Z123_VSD_MAP[k]] = v
        elif k.startswith("vsd_") and mode != "vsd":
            continue  # vsd-only knobs are inert in sds mode (reference too)
        else:
            dropped.append(k)
    if dropped:
        dreammat_tpu.info(
            "zero123-unified: ignoring torch-mechanics keys %s", dropped
        )
    name = "zero123-vsd-guidance" if mode == "vsd" else "zero123-guidance"
    return dreammat_tpu.find(name)(out)
