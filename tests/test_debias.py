"""BERT-PMI prompt debiasing (reference prompt_processors/base.py:467-529):
the masked-LM machinery, the PMI word-dropping rule, and the torch-key
converter — all hermetic (no BERT checkpoint ships in this image)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreammat_tpu.models import debias
from dreammat_tpu.models.diffusion.bert import (
    BertConfig, BertForMaskedLM, bert_params_from_torch,
)
from dreammat_tpu.models.diffusion.wordpiece import WordPieceTokenizer


def test_wordpiece_real_vocab(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "side", "front",
             "back", "overhead", "view", "of", "a", "golden", "tea", "##pot"]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer.from_dir(str(tmp_path))
    ids, mask = tok.encode("a golden teapot [MASK]", max_length=12)
    v = {w: i for i, w in enumerate(vocab)}
    assert ids[0] == v["[CLS]"]
    assert ids[1:6] == [v["a"], v["golden"], v["tea"], v["##pot"], v["[MASK]"]]
    assert ids[6] == v["[SEP]"]
    assert mask[:7] == [1] * 7 and sum(mask) == 7
    assert tok.tokenize_words(["side", "front", "back", "overhead"]) == [5, 6, 7, 8]


def test_bert_mlm_padding_invariance():
    cfg = BertConfig.tiny()
    model = BertForMaskedLM(cfg)
    ids = jnp.asarray([[5, 6, 7, 0, 0, 0, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0, 0, 0]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    a = model.apply(params, ids, mask)
    ids2 = ids.at[0, 5].set(99)  # mutate a PADDED slot
    b = model.apply(params, ids2, mask)
    assert np.allclose(np.asarray(a[0, :3]), np.asarray(b[0, :3]), atol=1e-5)


def test_bert_torch_key_conversion():
    cfg = BertConfig.tiny()
    model = BertForMaskedLM(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    ref = model.init(jax.random.PRNGKey(1), ids, mask)

    rng = np.random.RandomState(0)
    sd = {}
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    sd["bert.embeddings.word_embeddings.weight"] = rng.randn(V, H).astype(np.float32)
    sd["bert.embeddings.position_embeddings.weight"] = rng.randn(cfg.max_length, H).astype(np.float32)
    sd["bert.embeddings.token_type_embeddings.weight"] = rng.randn(2, H).astype(np.float32)
    sd["bert.embeddings.LayerNorm.weight"] = rng.randn(H).astype(np.float32)
    sd["bert.embeddings.LayerNorm.bias"] = rng.randn(H).astype(np.float32)
    for i in range(cfg.num_layers):
        b = f"bert.encoder.layer.{i}."
        for nm, shp in [
            ("attention.self.query", (H, H)), ("attention.self.key", (H, H)),
            ("attention.self.value", (H, H)), ("attention.output.dense", (H, H)),
            ("intermediate.dense", (I, H)), ("output.dense", (H, I)),
        ]:
            sd[b + nm + ".weight"] = rng.randn(*shp).astype(np.float32)
            sd[b + nm + ".bias"] = rng.randn(shp[0]).astype(np.float32)
        for nm in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[b + nm + ".weight"] = rng.randn(H).astype(np.float32)
            sd[b + nm + ".bias"] = rng.randn(H).astype(np.float32)
    sd["cls.predictions.transform.dense.weight"] = rng.randn(H, H).astype(np.float32)
    sd["cls.predictions.transform.dense.bias"] = rng.randn(H).astype(np.float32)
    sd["cls.predictions.transform.LayerNorm.weight"] = rng.randn(H).astype(np.float32)
    sd["cls.predictions.transform.LayerNorm.bias"] = rng.randn(H).astype(np.float32)
    sd["cls.predictions.decoder.weight"] = sd["bert.embeddings.word_embeddings.weight"]
    sd["cls.predictions.bias"] = rng.randn(V).astype(np.float32)

    params = bert_params_from_torch(sd, cfg)
    # structure + shapes must match init exactly, and the model must run
    ref_flat = jax.tree_util.tree_leaves_with_path(ref)
    new_flat = jax.tree_util.tree_leaves_with_path(params)
    assert len(ref_flat) == len(new_flat)
    for (pa, a), (pb, b) in zip(ref_flat, new_flat):
        assert pa == pb
        assert a.shape == np.asarray(b).shape, (pa, a.shape, np.asarray(b).shape)
    out = model.apply(params, ids, mask)
    # logits bounded and input-dependent (different ids -> different logits)
    assert float(np.abs(np.asarray(out)).max()) < 1e4
    out2 = model.apply(params, (ids + 1) % int(ids.max() + 2), mask)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def _controlled_mlm(tokenizer, boost_map):
    """mlm_fn whose [MASK] logits depend on whether a word is present:
    boost_map[word] = view index whose probability RISES when `word` is
    removed — exactly the pmi<0.95 condition that drops the word for that
    view (the word carries redundant view information)."""
    view_ids = tokenizer.tokenize_words(debias.VIEWS)

    def fn(ids, mask):
        ids_np = np.asarray(ids)
        logits = np.zeros((1, ids_np.shape[1], 30522), np.float32)
        present = set(ids_np[0].tolist())
        mask_pos = int(np.argmax(ids_np[0] == tokenizer.mask_token_id))
        base = np.zeros(4, np.float32)
        for w, view in boost_map.items():
            wid = tokenizer.tokenize_words([w])[0]
            if wid not in present:
                base[view] += 3.0  # removing w boosts that view's prob
        for i, vid in enumerate(view_ids):
            logits[0, mask_pos, vid] = base[i]
        return jnp.asarray(logits)

    return fn


def test_pmi_dropping_rule():
    tok = WordPieceTokenizer(vocab=None, vocab_size=30522)
    # removing "golden" boosts view 1 ("front"): part_probe[1]=0.87 vs
    # full=0.25 -> pmi = 0.25/0.56 < 0.95 -> dropped from view 1's prompt;
    # the other views see pmi = 0.25/0.147 > 0.95 -> kept. Words with no
    # effect (part == full) give pmi == 1 -> kept everywhere.
    mlm = _controlled_mlm(tok, {"golden": 1})
    out = debias.get_debiased_prompt("a golden teapot", mlm, tok)
    assert out[1] == "a teapot"
    assert out[0] == "a golden teapot"
    assert out[2] == "a golden teapot"
    assert out[3] == "a golden teapot"


def test_debias_integration_prompt_processor():
    """use_prompt_debiasing=true flows through the prompt processor and
    formats per-direction prompts (random tiny BERT: prompts stay valid
    strings containing the direction suffix)."""
    import dreammat_tpu
    import dreammat_tpu.models  # registry

    pp = dreammat_tpu.find("stable-diffusion-prompt-processor")(
        {
            "prompt": "a shiny kettle", "model_size": "tiny", "use_cache": False,
            "use_prompt_debiasing": True,
            "pretrained_model_name_or_path_prompt_debiasing": None,
        }
    )
    assert len(pp.prompts_vd) == 4
    assert all("view" in p for p in pp.prompts_vd)
