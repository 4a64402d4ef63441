"""BERT-PMI view-prompt debiasing (reference optional feature).

Rebuild of ``get_debiased_prompt`` (/root/reference/threestudio_dreammat/
threestudio/models/prompt_processors/base.py:467-529): a masked-LM scores
"This image is depicting a [MASK] view of {prompt}" over the four view
words; a word is dropped from view v's prompt when removing it shifts the
view distribution against v (pointwise-mutual-information test):

    pmi = full_probe / lerp(part_probe, full_probe, 0.5)
    drop word for view i  iff  pmi[i] < 0.95

The MLM is injectable: production uses the Flax BertForMaskedLM
(models/diffusion/bert.py) with locally-converted bert-base-uncased
weights; tests drive the exact algorithm with a synthetic scorer.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammat_tpu
from dreammat_tpu.models.diffusion.wordpiece import WordPieceTokenizer

VIEWS = ["side", "front", "back", "overhead"]


def build_bert_mlm(model_dir: Optional[str], size: str = "base", rng_seed: int = 0):
    """Returns (mlm_fn, tokenizer): mlm_fn(ids [B,N], mask [B,N]) -> logits.
    Random weights unless a converted checkpoint exists under model_dir
    (bert.npz, produced by tools/check_weights.py --bert from a torch
    state dict)."""
    from dreammat_tpu.models.diffusion import bert as convert_module
    from dreammat_tpu.models.diffusion import convert
    from dreammat_tpu.models.diffusion.bert import BertConfig, BertForMaskedLM

    cfg = BertConfig.base_uncased() if size == "base" else BertConfig.tiny()
    model = BertForMaskedLM(cfg)
    tokenizer = WordPieceTokenizer.from_dir(model_dir, vocab_size=cfg.vocab_size)
    ids0 = jnp.zeros((1, 8), jnp.int32)
    m0 = jnp.ones((1, 8), jnp.int32)
    params = convert.fast_random_init(
        jax.random.PRNGKey(rng_seed), lambda: model.init(jax.random.PRNGKey(0), ids0, m0)
    )
    if model_dir:
        ckpt = convert.find_checkpoint_file(model_dir)
        if ckpt:
            sd = convert.load_torch_state_dict(ckpt)
            params = convert_module.bert_params_from_torch(sd, cfg)
            dreammat_tpu.info("loaded BERT weights from %s", ckpt)

    fn = jax.jit(lambda ids, mask: model.apply(params, ids, mask))
    return fn, tokenizer


def get_debiased_prompt(
    prompt: str,
    mlm_fn: Callable,
    tokenizer: WordPieceTokenizer,
    mask_ids: Optional[List[int]] = None,
    max_length: int = 32,
    threshold: float = 0.95,
) -> List[str]:
    """-> one debiased base prompt per view direction (side/front/back/
    overhead), reference base.py:467-529."""
    view_ids = jnp.asarray(tokenizer.tokenize_words(VIEWS))

    def modulate(p: str) -> jnp.ndarray:
        text = f"This image is depicting a {tokenizer.mask_token} view of {p}"
        ids, mask = tokenizer.encode(text, max_length=max_length)
        ids_a = jnp.asarray([ids], jnp.int32)
        logits = mlm_fn(ids_a, jnp.asarray([mask], jnp.int32))
        mask_pos = int(np.argmax(np.asarray(ids) == tokenizer.mask_token_id))
        probs = jax.nn.softmax(logits[0, mask_pos])[view_ids]
        return probs / jnp.sum(probs)

    words = prompt.split(" ")
    prompts = [list(words) for _ in VIEWS]
    full_probe = modulate(prompt)
    ids_to_mask = mask_ids if mask_ids is not None else list(range(len(words)))
    dreammat_tpu.info(
        "Words that can potentially be removed: %s",
        [words[i] for i in ids_to_mask],
    )
    for idx in ids_to_mask:
        part = " ".join(words[:idx] + words[idx + 1 :])
        part_probe = modulate(part)
        # torch.lerp(part, full, 0.5) == (part + full) / 2
        pmi = np.asarray(full_probe / (0.5 * (part_probe + full_probe)))
        for i in range(len(VIEWS)):
            if pmi[i] < threshold:
                prompts[i][idx] = ""
    debiased = [" ".join(w for w in p if w) for p in prompts]
    for v, dp in zip(VIEWS, debiased):
        dreammat_tpu.info("Debiased prompt of the %s view is [%s]", v, dp)
    return debiased
