import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.control.p2p import make_controller
from motioneditor_tpu.control.seq_aligner import (
    get_refinement_mapper,
    get_replacement_mapper,
    get_word_inds,
)
from motioneditor_tpu.models.clip_text import StubTokenizer


class WordTokenizer:
    """Transparent tokenizer: one token per word, ids stable. Mimics the
    CLIPTokenizer.encode/decode surface used by seq_aligner."""

    model_max_length = 77

    def __init__(self):
        self.vocab = {}

    def encode(self, text):
        ids = [0]  # bos
        for w in text.lower().split(" "):
            self.vocab.setdefault(w, len(self.vocab) + 10)
            ids.append(self.vocab[w])
        ids.append(1)  # eos
        return ids

    def decode(self, ids):
        inv = {v: k for k, v in self.vocab.items()}
        return "".join(inv.get(i, "?") for i in ids)


def test_get_word_inds():
    tok = WordTokenizer()
    inds = get_word_inds("a girl is dancing", "girl", tok)
    np.testing.assert_array_equal(inds, [2])


def test_replacement_mapper_identity_for_same_prompt():
    tok = WordTokenizer()
    m = get_replacement_mapper(["a girl is dancing", "a girl is dancing"], tok)
    np.testing.assert_allclose(m[0], np.eye(77), atol=1e-6)


def test_replacement_mapper_single_word_swap():
    tok = WordTokenizer()
    m = get_replacement_mapper(["a girl is dancing", "a man is dancing"], tok)[0]
    # all tokens map diagonally (1:1 swap keeps positions)
    np.testing.assert_allclose(m, np.eye(77), atol=1e-6)


def test_refinement_mapper_alignment():
    tok = WordTokenizer()
    mapper, alphas = get_refinement_mapper(
        ["a girl is dancing", "a girl is dancing outside"], tok
    )
    # common prefix aligns 1:1; the inserted word gets alpha 0 (new token)
    assert mapper.shape == (1, 77)
    assert alphas.shape == (1, 77)
    assert alphas[0][:5].min() == 1.0  # bos + common words map
    assert 0.0 in alphas[0][:8]  # the new word has no source


def test_controller_kinds():
    tok = WordTokenizer()
    c = make_controller(["a girl is dancing", "a man is dancing"], tok, 10)
    assert c.kind == "replace"
    c2 = make_controller(["a girl is dancing", "a girl is dancing outside"], tok, 10)
    assert c2.kind == "refine"


def test_controller_replace_probs():
    tok = WordTokenizer()
    c = make_controller(["a girl is dancing", "a man is dancing"], tok, 10,
                        cross_replace_steps=0.8, self_replace_steps=0.4)
    probs_base = jnp.ones((2, 4, 77)) / 77
    probs_edit = jnp.zeros((2, 4, 77))
    # step inside the replace window: edited probs come from base via mapper
    out = c.edit_cross_probs(probs_base, probs_edit, step=2)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)
    # step after the window: unchanged
    out2 = c.edit_cross_probs(probs_base, probs_edit, step=9)
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-6)
    # self replacement gate
    s = c.edit_self_probs(probs_base, probs_edit, step=1)
    np.testing.assert_allclose(np.asarray(s), np.asarray(probs_base))
    s2 = c.edit_self_probs(probs_base, probs_edit, step=5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(probs_edit))
