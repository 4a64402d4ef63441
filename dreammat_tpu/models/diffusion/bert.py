"""BERT masked-LM (bert-base-uncased shape) in Flax, for prompt debiasing.

From-scratch equivalent of the ``transformers.BertForMaskedLM`` the
reference loads for its optional view-prompt debiasing
(/root/reference/threestudio_dreammat/threestudio/models/prompt_processors/
base.py:10,467-529): post-LN encoder (BERT's original residual->LayerNorm
order, unlike CLIP's pre-LN), learned token+position+segment embeddings,
and the MLM head (dense -> gelu -> LayerNorm -> decoder tied-shape
projection with its own bias).

Weights: random by default (no checkpoints ship in this environment);
``convert.torch_to_flax_params(..., prefix="bert")`` ingests a real
bert-base-uncased state dict when one is available locally.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 512
    type_vocab_size: int = 2

    @staticmethod
    def base_uncased() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def tiny() -> "BertConfig":
        return BertConfig(
            vocab_size=256, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, max_length=32,
        )


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        B, N, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x)
        q = q.reshape(B, N, c.num_heads, head_dim)
        k = k.reshape(B, N, c.num_heads, head_dim)
        v = v.reshape(B, N, c.num_heads, head_dim)
        # bidirectional with padding mask [B, N] (1 = attend)
        bias = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -1e9)
        attn = jax.nn.dot_product_attention(q, k, v, bias=bias)
        attn = attn.reshape(B, N, c.hidden_size)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="attn_ln")(x + attn)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="inter")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="out")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="out_ln")(x + h)


class BertForMaskedLM(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attn_mask: jnp.ndarray) -> jnp.ndarray:
        """input_ids/attn_mask [B,N] -> MLM logits [B,N,vocab]."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="word_embeddings")(input_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (c.max_length, c.hidden_size))
        seg = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                         (c.type_vocab_size, c.hidden_size))
        x = tok + pos[None, : input_ids.shape[1]].astype(self.dtype) + seg[0][None, None]
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="embeddings_ln")(x)
        for i in range(c.num_layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, attn_mask)
        # MLM head (BertOnlyMLMHead): transform then tied-shape decoder
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="mlm_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="mlm_ln")(h)
        logits = nn.Dense(c.vocab_size, dtype=self.dtype, name="mlm_decoder")(h)
        return logits.astype(jnp.float32)


def bert_params_from_torch(sd, cfg: BertConfig):
    """HuggingFace BertForMaskedLM state dict -> this module's param tree.
    Key map mirrors transformers' modeling_bert naming; linear kernels
    transpose torch's [out,in] to flax's [in,out]."""
    import numpy as np

    def t(k):
        return np.asarray(sd[k]).T

    def a(k):
        return np.asarray(sd[k])

    p = {
        "word_embeddings": {"embedding": a("bert.embeddings.word_embeddings.weight")},
        "position_embeddings": a("bert.embeddings.position_embeddings.weight"),
        "token_type_embeddings": a("bert.embeddings.token_type_embeddings.weight"),
        "embeddings_ln": {
            "scale": a("bert.embeddings.LayerNorm.weight"),
            "bias": a("bert.embeddings.LayerNorm.bias"),
        },
        "mlm_dense": {
            "kernel": t("cls.predictions.transform.dense.weight"),
            "bias": a("cls.predictions.transform.dense.bias"),
        },
        "mlm_ln": {
            "scale": a("cls.predictions.transform.LayerNorm.weight"),
            "bias": a("cls.predictions.transform.LayerNorm.bias"),
        },
        "mlm_decoder": {
            # decoder weight is tied to the word embedding in HF exports;
            # prefer the explicit key, fall back to the tied tensor
            "kernel": (t("cls.predictions.decoder.weight")
                       if "cls.predictions.decoder.weight" in sd
                       else a("bert.embeddings.word_embeddings.weight").T),
            "bias": a("cls.predictions.bias"),
        },
    }
    for i in range(cfg.num_layers):
        b = f"bert.encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "query": {"kernel": t(b + "attention.self.query.weight"),
                      "bias": a(b + "attention.self.query.bias")},
            "key": {"kernel": t(b + "attention.self.key.weight"),
                    "bias": a(b + "attention.self.key.bias")},
            "value": {"kernel": t(b + "attention.self.value.weight"),
                      "bias": a(b + "attention.self.value.bias")},
            "attn_out": {"kernel": t(b + "attention.output.dense.weight"),
                         "bias": a(b + "attention.output.dense.bias")},
            "attn_ln": {"scale": a(b + "attention.output.LayerNorm.weight"),
                        "bias": a(b + "attention.output.LayerNorm.bias")},
            "inter": {"kernel": t(b + "intermediate.dense.weight"),
                      "bias": a(b + "intermediate.dense.bias")},
            "out": {"kernel": t(b + "output.dense.weight"),
                    "bias": a(b + "output.dense.bias")},
            "out_ln": {"scale": a(b + "output.LayerNorm.weight"),
                       "bias": a(b + "output.LayerNorm.bias")},
        }
    return {"params": p}
