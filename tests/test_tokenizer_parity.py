"""Tokenizer parity vectors (VERDICT round-1 missing #4).

The reference tokenizes with NLTK ``word_tokenize`` when punkt data exists
and ``.split()`` otherwise (multimodal_data.py:244-251, 283-289) — but it
always tokenizes CLEANED captions (lowercased, ``[^\\w\\s]`` stripped at
parse time, :158-161). ``word_tokenize`` = punkt sentence split + the
data-free Treebank word tokenizer; on punctuation-free single-sentence
text the punkt stage is a no-op and the Treebank stage reduces to
whitespace splitting. These vectors prove it: for a corpus of raw
Flickr-style captions, ``TreebankWordTokenizer`` on the cleaned text equals
``.split()`` token-for-token — so vocab ids built offline (split fallback)
are identical to a punkt-equipped reference run.
"""

import pytest

from atq_tpu.data.flickr8k import clean_caption, tokenize

nltk = pytest.importorskip("nltk")
from nltk.tokenize import TreebankWordTokenizer  # noqa: E402

# Raw captions in the styles that actually occur in Flickr8k.token.txt
# (punctuation, contractions, hyphens, digits, quotes, multiple spaces).
RAW_CAPTIONS = [
    "A child in a pink dress is climbing up a set of stairs .",
    "A black dog and a spotted dog are fighting",
    "Two men, one in gray and one in black, stand near a fence.",
    "A man isn't riding a bike; he's running!",
    "The blue-eyed girl doesn't like ice-cream...",
    'A boy says "hello" to his friend\'s dog.',
    "3 people  sit   on a bench (near the lake).",
    "A rock climber — high above the canyon — looks down",
    "Don't stop; can't won't shouldn't've",
    "100% of the dogs run 2 miles/day",
    "",
]


@pytest.mark.parametrize("raw", RAW_CAPTIONS)
def test_treebank_equals_split_on_cleaned_captions(raw):
    cleaned = clean_caption(raw)
    treebank = TreebankWordTokenizer().tokenize(cleaned)
    assert treebank == cleaned.split(), (
        f"punkt-path tokens would diverge from split fallback on {raw!r}")


@pytest.mark.parametrize("raw", RAW_CAPTIONS)
def test_pipeline_tokenize_matches_treebank(raw):
    """The pipeline's tokenize() (split fallback offline) produces exactly
    the tokens a punkt-equipped reference would for every vector."""
    cleaned = clean_caption(raw)
    assert tokenize(cleaned) == TreebankWordTokenizer().tokenize(cleaned)


def test_cleaning_is_identical_to_reference_regex():
    """clean_caption mirrors multimodal_data.py:158-161 exactly."""
    import re

    for raw in RAW_CAPTIONS:
        ref = re.sub(r"[^\w\s]", "", raw.lower())
        assert clean_caption(raw) == ref
