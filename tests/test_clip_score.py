"""CLIP similarity scoring path (tools/clip_score.py, VERDICT r3 #8).

The reference reports CLIP parity in its paper with no in-tree metric code;
this framework ships the scoring path. Tests run the tiny random towers —
they verify the MECHANISM (pooling, projection, normalization, range), not
metric quality, which needs real CLIP weights.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from clip_score import CLIPScoreConfig, CLIPScorer


@pytest.fixture(scope="module")
def scorer():
    return CLIPScorer(cfg=CLIPScoreConfig.tiny())


def test_score_range_and_determinism(scorer):
    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    s1 = scorer.score(img, "a red apple")
    s2 = scorer.score(img, "a red apple")
    assert 0.0 <= s1 <= 100.0
    assert s1 == s2  # pure function of (image, prompt)
    assert scorer.random_weights  # hermetic mode is labeled as such


def test_score_depends_on_image_and_prompt(scorer):
    rs = np.random.RandomState(1)
    img_a = rs.rand(32, 32, 3).astype(np.float32)
    img_b = rs.rand(32, 32, 3).astype(np.float32)
    s_a = scorer.score(img_a, "a red apple")
    s_b = scorer.score(img_b, "a red apple")
    s_p = scorer.score(img_a, "a blue violin underwater")
    # even random towers map different inputs to different embeddings;
    # equality here would mean pooling/projection is ignoring its input
    assert s_a != s_b
    assert s_a != s_p


def test_eot_pooling_uses_highest_token_position(scorer):
    """Text embeddings must pool the EOT position: padding-only changes
    after EOT must not change the score (CLIP convention)."""
    import jax.numpy as jnp

    tok = scorer.tokenizer
    ids = np.asarray(tok("a red apple"))
    # find EOT (first max id); everything after it is EOS padding
    eot = int(np.argmax(ids))
    assert (ids[eot + 1:] == ids[eot]).all()  # CLIP pads with EOS
    t1 = scorer.text.apply(scorer.text_params, jnp.asarray(ids)[None])
    # causal transformer: positions after EOT cannot influence the EOT
    # hidden state, so zeroing the trailing padding is a no-op
    ids2 = ids.copy()
    if eot + 1 < len(ids2):
        ids2[eot + 1:] = 0
    t2 = scorer.text.apply(scorer.text_params, jnp.asarray(ids2)[None])
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-5)
