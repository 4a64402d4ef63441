"""DeepFloyd-IF prompt processor: T5-XXL text embeddings.

TPU-native rebuild of ``deep-floyd-prompt-processor``
(/root/reference/threestudio_dreammat/threestudio/models/prompt_processors/
deepfloyd_prompt_processor.py:16-77): same view-dependent prompt surface,
caching, and perp-neg weighting as the stable-diffusion processor — only
the text tower differs (T5-v1.1-XXL encoder instead of CLIP). The whole
bucketed-embedding machinery is inherited; just ``_get_encoder`` swaps.

Tokenization: T5 uses SentencePiece. When the real ``spiece.model`` +
``transformers`` tokenizer files are present under the model cache dir we
use them; otherwise (hermetic CI — no weights ship in this image) a
deterministic byte-level fallback produces valid ids so the architecture
and caching paths stay exercised. Real-checkpoint runs must provide the
tokenizer files, same as they must provide the weights.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.models.diffusion.t5 import T5Config, T5Encoder
from dreammat_tpu.models.prompt import StableDiffusionPromptProcessor


class T5ByteFallbackTokenizer:
    """Byte-level stand-in: pad=0, eos=1, byte b -> 2+b (documented
    fallback — NOT SentencePiece; see module docstring)."""

    def __init__(self, max_length: int, vocab_size: int):
        self.max_length = max_length
        self.vocab_size = vocab_size

    def batch(self, prompts: List[str]) -> np.ndarray:
        out = np.zeros((len(prompts), self.max_length), np.int32)
        for i, p in enumerate(prompts):
            ids = [2 + b for b in p.encode("utf-8")][: self.max_length - 1]
            ids.append(1)  # </s>
            out[i, : len(ids)] = np.asarray(ids) % self.vocab_size
        return out


class T5SentencePieceTokenizer:
    """Real T5 tokenization via transformers (requires spiece.model)."""

    def __init__(self, tok, max_length: int):
        self.tok = tok
        self.max_length = max_length

    def batch(self, prompts: List[str]) -> np.ndarray:
        enc = self.tok(
            list(prompts), padding="max_length", max_length=self.max_length,
            truncation=True, return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


@dreammat_tpu.register("deep-floyd-prompt-processor")
class DeepFloydPromptProcessor(StableDiffusionPromptProcessor):
    @dataclass
    class Config(StableDiffusionPromptProcessor.Config):
        pretrained_model_name_or_path: str = "DeepFloyd/IF-I-XL-v1.0"

    cfg: Config

    def _get_encoder(self):
        if self._text_encoder is None:
            size = self.cfg.model_size
            tcfg = T5Config.xxl() if size == "sd21" else T5Config.tiny()
            model = T5Encoder(tcfg)
            tok_dir = os.path.join(
                self.cfg.pretrained_model_cache_dir, "tokenizer"
            )
            tok = None
            if os.path.exists(os.path.join(tok_dir, "spiece.model")):
                try:
                    from transformers import T5Tokenizer

                    tok = T5SentencePieceTokenizer(
                        T5Tokenizer.from_pretrained(tok_dir), tcfg.max_length
                    )
                    dreammat_tpu.info("loaded T5 tokenizer from %s", tok_dir)
                except Exception as e:  # pragma: no cover
                    dreammat_tpu.warn("T5 tokenizer load failed: %s", e)
            if tok is None:
                tok = T5ByteFallbackTokenizer(tcfg.max_length, tcfg.vocab_size)
            from dreammat_tpu.models.diffusion import convert

            params = convert.fast_random_init(
                jax.random.PRNGKey(0),
                lambda: model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, tcfg.max_length), jnp.int32),
                ),
            )
            te_dir = os.path.join(
                self.cfg.pretrained_model_cache_dir, "text_encoder"
            )
            ckpt = convert.find_checkpoint_file(te_dir) if os.path.isdir(te_dir) else None
            if ckpt:
                sd = convert.load_torch_state_dict(ckpt)
                params = convert.torch_to_flax_params(sd, params, "t5", strict=False)
                dreammat_tpu.info("loaded T5 encoder from %s", ckpt)
            self._text_encoder = (model, params, tok)
        return self._text_encoder


@dreammat_tpu.register("dummy-prompt-processor")
class DummyPromptProcessor(StableDiffusionPromptProcessor):
    """No-op prompt processor for prompt-free guidances (reference
    .../prompt_processors/dummy_prompt_processor.py:11-18) — tiny-CLIP
    embeddings of the (possibly empty) prompt so downstream shapes hold."""

    @dataclass
    class Config(StableDiffusionPromptProcessor.Config):
        prompt: str = ""
        model_size: str = "tiny"
        use_cache: bool = False
