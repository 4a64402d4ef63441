"""Prompt processing: view-dependent prompts + cached CLIP text embeddings.

Rebuild of the reference prompt-processor layer
(/root/reference/threestudio_dreammat/threestudio/models/prompt_processors/
base.py:192-543, stable_diffusion_prompt_processor.py:74-106) with the same
semantics — view-direction buckets (side/front/back/overhead with the same
thresholds and ordering), text/uncond/null embeddings, Perp-Neg weights, and
an md5-keyed on-disk embedding cache — but with no subprocess: JAX has no
CUDA-context fragmentation concern (base.py:392-404 spawns purely to free
VRAM), so embeddings are computed inline with a jitted text encoder.

Direction selection runs *inside jit* on traced (elevation, azimuth) so the
whole guidance step stays on device.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.models.diffusion.clip_text import CLIPTextConfig, CLIPTextModel
from dreammat_tpu.models.diffusion.tokenizer import CLIPTokenizer
from dreammat_tpu.utils.base import BaseObject


def shift_azimuth_deg(azimuth):
    return (azimuth + 180.0) % 360.0 - 180.0


def shifted_exponential_decay(a, b, c, r):
    return a * jnp.exp(-b * r) + c


class PromptEmbeddings(NamedTuple):
    """Pytree handed into the jitted step (reference PromptProcessorOutput,
    base.py:37-190)."""

    text_vd: jnp.ndarray        # [4, N, D] per-direction prompt embeddings
    uncond_vd: jnp.ndarray      # [4, N, D]
    text: jnp.ndarray           # [N, D]
    uncond: jnp.ndarray         # [N, D]
    null: jnp.ndarray           # [N, D]
    use_perp_neg: bool = False
    perp_neg_f_sb: Tuple[float, float, float] = (1, 0.5, -0.606)
    perp_neg_f_fsb: Tuple[float, float, float] = (1, 0.5, +0.967)
    perp_neg_f_fs: Tuple[float, float, float] = (4, 0.5, -2.426)
    perp_neg_f_sf: Tuple[float, float, float] = (4, 0.5, -2.426)

    def direction_idx(self, elevation, azimuth, overhead_th=60.0, front_th=45.0, back_th=45.0):
        """0=side, 1=front, 2=back, 3=overhead — later conditions override
        (base.py:281-316 ordering)."""
        azi = shift_azimuth_deg(azimuth)
        idx = jnp.zeros_like(elevation, dtype=jnp.int32)
        idx = jnp.where((azi > -front_th) & (azi < front_th), 1, idx)
        idx = jnp.where((azi > 180 - back_th) | (azi < -180 + back_th), 2, idx)
        idx = jnp.where(elevation > overhead_th, 3, idx)
        return idx

    def get_text_embeddings(self, elevation, azimuth, camera_distances,
                            view_dependent_prompting: bool = True,
                            return_null: bool = True):
        """Returns [3B,N,D] (text,uncond,null) or [2B,N,D]; order matches
        the reference (cond first — base.py:80-85)."""
        B = elevation.shape[0]
        if view_dependent_prompting:
            d = self.direction_idx(elevation, azimuth)
            text = self.text_vd[d]
            uncond = self.uncond_vd[d]
        else:
            text = jnp.broadcast_to(self.text[None], (B, *self.text.shape))
            uncond = jnp.broadcast_to(self.uncond[None], (B, *self.uncond.shape))
        null = jnp.broadcast_to(self.null[None], (B, *self.null.shape))
        if return_null:
            return jnp.concatenate([text, uncond, null], axis=0)
        return jnp.concatenate([text, uncond], axis=0)

    def get_text_embeddings_perp_neg(self, elevation, azimuth, camera_distances,
                                     return_null: bool = True):
        """[5B,N,D]: pos, uncond, 2 interpolated negatives, null; plus
        [B,2] negative guidance weights (base.py:88-184)."""
        B = elevation.shape[0]
        d = self.direction_idx(elevation, azimuth)
        azi = shift_azimuth_deg(azimuth)
        side, front, back, overhead = (
            self.text_vd[0], self.text_vd[1], self.text_vd[2], self.text_vd[3]
        )
        is_overhead = (d == 3)[:, None, None]
        front_side = jnp.abs(azi) < 90.0
        r_fs = 1.0 - jnp.abs(azi) / 90.0
        r_sb = 2.0 - jnp.abs(azi) / 90.0

        pos_fs = r_fs[:, None, None] * front[None] + (1 - r_fs)[:, None, None] * side[None]
        pos_sb = r_sb[:, None, None] * side[None] + (1 - r_sb)[:, None, None] * back[None]
        pos = jnp.where(front_side[:, None, None], pos_fs, pos_sb)
        pos = jnp.where(is_overhead, overhead[None], pos)

        uncond = self.uncond_vd[d]

        neg0 = jnp.where(front_side[:, None, None], front[None], side[None])
        neg1 = jnp.where(front_side[:, None, None], side[None], front[None])
        neg0 = jnp.where(is_overhead, uncond, neg0)
        neg1 = jnp.where(is_overhead, uncond, neg1)

        w0_fs = -shifted_exponential_decay(*self.perp_neg_f_fs, r_fs)
        w1_fs = -shifted_exponential_decay(*self.perp_neg_f_sf, 1 - r_fs)
        w0_sb = -shifted_exponential_decay(*self.perp_neg_f_sb, r_sb)
        w1_sb = -shifted_exponential_decay(*self.perp_neg_f_fsb, r_sb)
        w0 = jnp.where(front_side, w0_fs, w0_sb)
        w1 = jnp.where(front_side, w1_fs, w1_sb)
        w0 = jnp.where(d == 3, 0.0, w0)
        w1 = jnp.where(d == 3, 0.0, w1)
        weights = jnp.stack([w0, w1], axis=-1)

        # interleave negatives like the reference ([n0(b0), n1(b0), n0(b1), ...])
        negs = jnp.stack([neg0, neg1], axis=1).reshape(2 * B, *neg0.shape[1:])
        null = jnp.broadcast_to(self.null[None], (B, *self.null.shape))
        parts = [pos, uncond, negs] + ([null] if return_null else [])
        return jnp.concatenate(parts, axis=0), weights


@dreammat_tpu.register("stable-diffusion-prompt-processor")
class StableDiffusionPromptProcessor(BaseObject):
    @dataclass
    class Config:
        prompt: str = "a hamburger"
        prompt_front: Optional[str] = None
        prompt_side: Optional[str] = None
        prompt_back: Optional[str] = None
        prompt_overhead: Optional[str] = None
        negative_prompt: str = ""
        pretrained_model_name_or_path: str = "stabilityai/stable-diffusion-2-1-base"
        pretrained_model_cache_dir: str = "model"
        overhead_threshold: float = 60.0
        front_threshold: float = 45.0
        back_threshold: float = 45.0
        view_dependent_prompt_front: bool = False
        use_cache: bool = True
        spawn: bool = True  # accepted for config parity; no subprocess needed
        cache_dir: str = ".dreammat_tpu_cache/text_embeddings"
        use_perp_neg: bool = False
        perp_neg_f_sb: Tuple = (1, 0.5, -0.606)
        perp_neg_f_fsb: Tuple = (1, 0.5, +0.967)
        perp_neg_f_fs: Tuple = (4, 0.5, -2.426)
        perp_neg_f_sf: Tuple = (4, 0.5, -2.426)
        use_prompt_debiasing: bool = False
        pretrained_model_name_or_path_prompt_debiasing: str = "model/bert-base-uncased"
        prompt_debiasing_mask_ids: Optional[List[int]] = None
        prompt_library_path: str = "load/prompt_library.json"
        model_size: str = "sd21"  # "sd21" | "tiny" (tests)

    cfg: Config

    def preprocess_prompt(self, prompt: str) -> str:
        """``lib:key`` prompts resolve through the prompt library JSON
        (reference base.py:441-470)."""
        if prompt.startswith("lib:"):
            import json

            with open(self.cfg.prompt_library_path) as f:
                library = json.load(f)
            key = prompt[4:]
            candidates = []
            for collection in library.values():
                if isinstance(collection, dict) and key in collection:
                    candidates.append(collection[key])
            if not candidates:
                raise ValueError(f"prompt '{key}' not found in the prompt library")
            return candidates[0]
        return prompt

    def configure(self, text_encoder=None) -> None:
        """``text_encoder``: optional (model, params, tokenizer) shared with
        the guidance to avoid loading CLIP twice."""
        cfg = self.cfg
        if cfg.view_dependent_prompt_front:
            fmt = ["side view of {}", "front view of {}", "backside view of {}", "overhead view of {}"]
        else:
            fmt = ["{}, side view", "{}, front view", "{}, back view", "{}, overhead view"]
        self.direction_names = ["side", "front", "back", "overhead"]
        prompt = self.preprocess_prompt(cfg.prompt)
        self.prompt = prompt
        if cfg.use_prompt_debiasing:
            # BERT-PMI debiasing (reference base.py:328-338,467-529): one
            # debiased base prompt per direction, then direction-formatted
            assert (
                cfg.prompt_side is None and cfg.prompt_back is None
                and cfg.prompt_overhead is None
            ), "Do not manually assign view prompts when using prompt debiasing"
            from dreammat_tpu.models.debias import build_bert_mlm, get_debiased_prompt

            mlm_fn, tok = build_bert_mlm(
                cfg.pretrained_model_name_or_path_prompt_debiasing,
                size="base" if cfg.model_size == "sd21" else "tiny",
            )
            debiased = get_debiased_prompt(
                prompt, mlm_fn, tok, mask_ids=cfg.prompt_debiasing_mask_ids
            )
            self.prompts_vd = [f.format(p) for f, p in zip(fmt, debiased)]
        else:
            manual = [cfg.prompt_side, cfg.prompt_front, cfg.prompt_back, cfg.prompt_overhead]
            self.prompts_vd = [
                m if m is not None else f.format(prompt) for m, f in zip(manual, fmt)
            ]
        self.negative_prompts_vd = [cfg.negative_prompt] * 4
        self._text_encoder = text_encoder
        self._emb: Optional[PromptEmbeddings] = None

    # -- embedding computation ------------------------------------------
    def _get_encoder(self):
        if self._text_encoder is None:
            size = self.cfg.model_size
            ccfg = CLIPTextConfig.sd21() if size == "sd21" else CLIPTextConfig.tiny()
            model = CLIPTextModel(ccfg)
            tok = CLIPTokenizer(
                vocab_dir=os.path.join(self.cfg.pretrained_model_cache_dir, "tokenizer"),
                max_length=ccfg.max_length,
                vocab_size=ccfg.vocab_size,
            )
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, ccfg.max_length), dtype=jnp.int32)
            )
            # try to load real weights if present
            from dreammat_tpu.models.diffusion import convert

            te_dir = os.path.join(self.cfg.pretrained_model_cache_dir, "text_encoder")
            ckpt = convert.find_checkpoint_file(te_dir) if os.path.isdir(te_dir) else None
            if ckpt:
                sd = convert.load_torch_state_dict(ckpt)
                params = convert.torch_to_flax_params(sd, params, "clip", strict=False)
                dreammat_tpu.info("loaded CLIP text encoder from %s", ckpt)
            self._text_encoder = (model, params, tok)
        return self._text_encoder

    def _cache_key(self, prompt: str) -> str:
        ident = f"{self.cfg.pretrained_model_name_or_path}-{self.cfg.model_size}-{prompt}"
        return hashlib.md5(ident.encode()).hexdigest()

    def encode_prompts(self, prompts: List[str]) -> np.ndarray:
        """Compute (or load cached) [len(prompts), N, D] embeddings
        (cache semantics of base.py:364-439). Multi-host: rank 0 fills the
        shared cache first and everyone barriers — the reference's rank-0
        + barrier pattern (prompt_processors/base.py:364-416) — so N hosts
        sharing a filesystem don't race on the same .npy files."""
        from dreammat_tpu.parallel import distributed as dist

        os.makedirs(self.cfg.cache_dir, exist_ok=True)
        if self.cfg.use_cache and dist.process_count() > 1:
            for p in prompts:
                path = os.path.join(self.cfg.cache_dir, self._cache_key(p) + ".npy")
                dist.rank_zero_fill(
                    path,
                    lambda p=p, path=path: np.save(path, self._encode_uncached([p])[0]),
                    name="text_embeddings",
                )
        out = [None] * len(prompts)
        to_compute = []
        for i, p in enumerate(prompts):
            path = os.path.join(self.cfg.cache_dir, self._cache_key(p) + ".npy")
            if self.cfg.use_cache and os.path.exists(path):
                out[i] = np.load(path)
            else:
                to_compute.append(i)
        if to_compute:
            emb = self._encode_uncached([prompts[i] for i in to_compute])
            for j, i in enumerate(to_compute):
                out[i] = emb[j]
                if self.cfg.use_cache:
                    path = os.path.join(self.cfg.cache_dir, self._cache_key(prompts[i]) + ".npy")
                    np.save(path, emb[j])
        return np.stack(out)

    def _encode_uncached(self, prompts: List[str]) -> np.ndarray:
        model, params, tok = self._get_encoder()
        ids = jnp.asarray(tok.batch(prompts))
        return np.asarray(jax.jit(model.apply)(params, ids))

    def __call__(self) -> PromptEmbeddings:
        if self._emb is None:
            cfg = self.cfg
            all_prompts = (
                [self.prompt, cfg.negative_prompt, ""]
                + self.prompts_vd
                + self.negative_prompts_vd
            )
            emb = self.encode_prompts(all_prompts)
            self._emb = PromptEmbeddings(
                text=jnp.asarray(emb[0]),
                uncond=jnp.asarray(emb[1]),
                null=jnp.asarray(emb[2]),
                text_vd=jnp.asarray(emb[3:7]),
                uncond_vd=jnp.asarray(emb[7:11]),
                use_perp_neg=cfg.use_perp_neg,
                perp_neg_f_sb=tuple(cfg.perp_neg_f_sb),
                perp_neg_f_fsb=tuple(cfg.perp_neg_f_fsb),
                perp_neg_f_fs=tuple(cfg.perp_neg_f_fs),
                perp_neg_f_sf=tuple(cfg.perp_neg_f_sf),
            )
        return self._emb
