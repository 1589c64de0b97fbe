"""Punkt-tokenizer parity (SURVEY §7 hard part; VERDICT r3 next-step #5).

The reference builds its vocabulary with ``nltk.tokenize.word_tokenize``
when punkt data is installed and ``.split()`` otherwise
(multimodal_data.py:244-251, :283-289), always on CLEANED captions
(lowercased, ``[^\\w\\s]`` stripped at parse time, :158-161). Vocab ids —
and so checkpoints and metrics — depend on which path ran.

Round 3 asserted the two paths agree on cleaned text; that is FALSE: the
MacIntyre contraction rules are apostrophe-free for six words
(cannot/gimme/gonna/gotta/lemme/wanna) and fire on cleaned captions
("gonna" -> "gon"+"na"), so a punkt-equipped reference run diverges from
the split fallback. The framework therefore vendors a full PTB/NLTK-rule
tokenizer (atq_tpu/data/treebank.py) and uses it by default; these tests
pin it three ways:

1. token equality against RECORDED golden output of the installed NLTK
   (tests/data/tokenizer_goldens.json — runs with no nltk at all);
2. live cross-check against nltk's NLTKWordTokenizer when importable,
   including a 1000-case fuzz;
3. id-level VOCAB equality: the full Flickr8k-style vocab build over a
   contraction-bearing caption corpus matches a reference-style build
   that uses nltk's tokenizer.

The ``.split()`` escape hatch (``ATQ_SPLIT_TOKENIZER=1``, for reproducing
a punkt-less reference run) and the recorded-vocab loader are tested too.
"""

import json
import os
import re

import pytest

from atq_tpu.data.flickr8k import SPECIALS, clean_caption, tokenize
from atq_tpu.data.treebank import ptb_tokenize, sent_split, word_tokenize

GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                      "tokenizer_goldens.json")))
VECTORS = GOLDENS["vectors"]


# ---------------------------------------------------------------------------
# 1. Recorded goldens (no nltk needed)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("vec", VECTORS,
                         ids=[v["raw"][:32] or "<empty>" for v in VECTORS])
def test_vendored_matches_recorded_nltk_on_cleaned(vec):
    """Pipeline domain: vendored tokens == recorded word_tokenize output
    on the cleaned caption (punkt stage is the identity there)."""
    assert ptb_tokenize(vec["cleaned"]) == vec["nltk_on_cleaned"]
    assert word_tokenize(vec["cleaned"]) == vec["nltk_on_cleaned"]


@pytest.mark.parametrize("vec", VECTORS,
                         ids=[v["raw"][:32] or "<empty>" for v in VECTORS])
def test_vendored_matches_recorded_nltk_on_raw(vec):
    """General text (quotes, clitics, dashes, ellipses): vendored tokens ==
    recorded NLTKWordTokenizer output on the raw lowercased caption."""
    assert ptb_tokenize(vec["raw"].lower()) == vec["nltk_on_raw_lower"]


def test_cleaning_is_identical_to_reference_regex():
    """clean_caption mirrors multimodal_data.py:158-161 exactly."""
    for vec in VECTORS:
        assert clean_caption(vec["raw"]) == re.sub(
            r"[^\w\s]", "", vec["raw"].lower())


def test_contraction_divergence_from_split_is_real():
    """The reason the vendored tokenizer exists: on cleaned captions the
    punkt path splits the six apostrophe-free contractions; .split() does
    not. (This inverts round 3's wrong assertion.)"""
    cleaned = clean_caption("A dog is gonna catch it, he cannot miss")
    assert ptb_tokenize(cleaned) != cleaned.split()
    assert ptb_tokenize(cleaned) == [
        "a", "dog", "is", "gon", "na", "catch", "it", "he", "can", "not",
        "miss"]


# ---------------------------------------------------------------------------
# 2. Live cross-check vs installed nltk (skipped if absent)
# ---------------------------------------------------------------------------

nltk = pytest.importorskip("nltk")
from nltk.tokenize import NLTKWordTokenizer  # noqa: E402

_NLTK_TOK = NLTKWordTokenizer()


@pytest.mark.parametrize("vec", VECTORS,
                         ids=[v["raw"][:32] or "<empty>" for v in VECTORS])
def test_vendored_matches_live_nltk(vec):
    for text in (vec["cleaned"], vec["raw"].lower(), vec["raw"]):
        assert ptb_tokenize(text) == _NLTK_TOK.tokenize(text), text


def test_fuzz_vendored_vs_live_nltk():
    import random

    words = ["a", "dog", "isn't", "gonna", "cannot", "wanna", "lemme",
             "gotta", "gimme", "more'n", "'tis", "they'll", "it's",
             "blue-eyed", "3.88", "3,36", "100%", "hello", "--", "...",
             "(x)", "[y]", "«q»", "“f”", "it.", "end!", "what?", "'q'",
             '"d"', "&", "@u", "#t", "$5", ";", ":", "*"]
    rng = random.Random(0)
    for _ in range(1000):
        s = " ".join(rng.choice(words) for _ in range(rng.randint(1, 10)))
        if rng.random() < 0.3:
            s += rng.choice([".", "!", "?", "...", " ."])
        assert ptb_tokenize(s) == _NLTK_TOK.tokenize(s), repr(s)


# ---------------------------------------------------------------------------
# 3. Id-level vocab equality on a contraction-bearing corpus
# ---------------------------------------------------------------------------

# Synthetic caption corpus in reference style (each "caption" already
# cleaned by the parse step). Contraction words appear >= 5 times so they
# cross the min-frequency threshold and their SPLIT PIECES become vocab
# entries — the exact divergence the vendored tokenizer closes.
_CORPUS = (
    ["a dog is gonna catch the ball"] * 5
    + ["the man cannot hold the rope"] * 5
    + ["kids wanna swim in the lake"] * 5
    + ["a child runs on the beach"] * 5
    + ["rare words appear once only"] * 1
)


def _build_vocab(tokenizer):
    """The reference's _build_vocabulary loop (multimodal_data.py:235-265):
    first-seen insertion order, min frequency 5, specials 0-3."""
    counts = {}
    for caption in _CORPUS:
        for w in tokenizer(caption.lower()):
            counts[w] = counts.get(w, 0) + 1
    vocab = dict(SPECIALS)
    idx = len(SPECIALS)
    for w, c in counts.items():
        if c >= 5:
            vocab[w] = idx
            idx += 1
    return vocab


def test_vocab_ids_match_reference_nltk_build():
    """Token-id equality: vocab built with the pipeline's tokenize() ==
    vocab a punkt-equipped reference build produces (nltk tokenizer)."""
    ours = _build_vocab(tokenize)
    ref = _build_vocab(_NLTK_TOK.tokenize)
    assert ours == ref
    # The contraction pieces are IN the vocab (split would have missed
    # them and inserted 'gonna'/'cannot'/'wanna' instead).
    for piece in ("gon", "na", "can", "not", "wan"):
        assert piece in ours
    for joined in ("gonna", "cannot", "wanna"):
        assert joined not in ours


def test_split_escape_hatch(monkeypatch):
    """ATQ_SPLIT_TOKENIZER=1 reproduces a punkt-less reference run."""
    monkeypatch.setenv("ATQ_SPLIT_TOKENIZER", "1")
    assert tokenize("a dog is gonna run") == \
        ["a", "dog", "is", "gonna", "run"]
    monkeypatch.delenv("ATQ_SPLIT_TOKENIZER")
    assert tokenize("a dog is gonna run") == \
        ["a", "dog", "is", "gon", "na", "run"]


def test_recorded_vocab_escape_hatch(tmp_path):
    """A word_to_idx JSON recorded from a real reference run short-circuits
    the vocab build entirely (flickr8k.load_vocab_file)."""
    from atq_tpu.data.flickr8k import load_vocab_file, save_vocab_file

    vocab = _build_vocab(_NLTK_TOK.tokenize)
    path = tmp_path / "vocab.json"
    save_vocab_file(vocab, str(path))
    assert load_vocab_file(str(path)) == vocab


def test_vocab_tokenizer_stamp(tmp_path, monkeypatch):
    """Saved vocab files carry the tokenizer variant that built them
    (ADVICE round 4): the stamp round-trips, is stripped from the loaded
    vocab, and the compatibility rule treats nltk-punkt/vendored-ptb as
    interchangeable (token-identical on the caption domain) while 'split'
    is a real mismatch."""
    from atq_tpu.data.flickr8k import (
        active_tokenizer_variant,
        load_vocab_file,
        read_vocab_tokenizer,
        save_vocab_file,
        tokenizer_variants_compatible,
    )

    vocab = {"<PAD>": 0, "dog": 4}
    path = tmp_path / "vocab.json"
    save_vocab_file(vocab, str(path))
    assert load_vocab_file(str(path)) == vocab  # stamp stripped
    stamp = read_vocab_tokenizer(str(path))
    assert stamp == active_tokenizer_variant()
    assert stamp in ("nltk-punkt", "vendored-ptb", "split")

    monkeypatch.setenv("ATQ_SPLIT_TOKENIZER", "1")
    assert active_tokenizer_variant() == "split"
    save_vocab_file(vocab, str(path))
    assert read_vocab_tokenizer(str(path)) == "split"

    assert tokenizer_variants_compatible("nltk-punkt", "vendored-ptb")
    assert not tokenizer_variants_compatible("split", "vendored-ptb")
    # Pre-round-5 files carry no stamp.
    (tmp_path / "old.json").write_text('{"dog": 4}')
    assert read_vocab_tokenizer(str(tmp_path / "old.json")) is None


def test_sent_split_identity_on_captions():
    for vec in VECTORS:
        if vec["cleaned"].strip():
            assert sent_split(vec["cleaned"]) == [vec["cleaned"].strip()]


def test_sent_split_simple_prose():
    got = sent_split("A dog runs. The cat sleeps! Is it fun? Yes.")
    assert got == ["A dog runs.", "The cat sleeps!", "Is it fun?", "Yes."]
