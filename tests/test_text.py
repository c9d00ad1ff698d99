"""Tests for number spelling and punctuation normalization (reference:
retokenize.py:41-50 semantics)."""

from whisper_char_alignment_tpu.text import numwords, retokenize


def test_numwords_basic():
    n2w = numwords.num_to_words
    assert n2w(0) == "zero"
    assert n2w(7) == "seven"
    assert n2w(13) == "thirteen"
    assert n2w(20) == "twenty"
    assert n2w(42) == "forty-two"
    assert n2w(100) == "one hundred"
    assert n2w(105) == "one hundred and five"
    assert n2w(110) == "one hundred and ten"
    assert n2w(999) == "nine hundred and ninety-nine"


def test_numwords_scales():
    n2w = numwords.num_to_words
    assert n2w(1000) == "one thousand"
    assert n2w(2024) == "two thousand and twenty-four"
    assert n2w(1234) == "one thousand, two hundred and thirty-four"
    assert n2w(1000000) == "one million"
    assert n2w(1000005) == "one million and five"
    assert n2w(1234567) == (
        "one million, two hundred and thirty-four thousand, "
        "five hundred and sixty-seven"
    )


def test_remove_punctuation_keeps_apostrophes_inside_words():
    assert retokenize.remove_punctuation("don't stop!") == "don't stop"


def test_remove_punctuation_strips_edge_apostrophes():
    # word.strip(string.punctuation) removes leading/trailing apostrophes
    assert retokenize.remove_punctuation("'quoted' word.") == "quoted word"


def test_remove_punctuation_digits_spelled_out_hyphens_removed():
    # "42" -> "forty-two" -> final translate strips the hyphen
    assert retokenize.remove_punctuation("42 cats") == "fortytwo cats"


def test_remove_punctuation_large_number_commas_removed():
    out = retokenize.remove_punctuation("1234")
    assert out == "one thousand two hundred and thirtyfour"


def test_remove_punctuation_mixed_alnum_untouched():
    # isdigit() false for "4th" -> left as-is (minus punctuation)
    assert retokenize.remove_punctuation("the 4th item") == "the 4th item"


# ---------------------------------------------------------------------------
# Differential fuzz vs direct transcriptions of the reference's retokenize
# loops (reference retokenize.py:5-50). The production module was
# restructured around generator helpers (round-4 de-twinning); these oracles
# follow the reference line by line so any behavioral drift from a future
# restructuring shows up on some random draw.
# ---------------------------------------------------------------------------

import string as _string

import numpy as np
import pytest

from whisper_char_alignment_tpu.text import numwords, retokenize
from whisper_char_alignment_tpu.text.tokenizer import get_test_tokenizer


def _ref_char_encode(text, tok):
    tokens = []
    space_id = tok.encode(" ")
    wrds = text.split()
    for i in range(len(wrds)):
        for c in wrds[i]:
            tokens += tok.encode(c)
        if i < len(wrds) - 1:
            tokens += space_id
    return tokens


def _ref_char_split(tokens, tok):
    subwords, subword_tokens_list = tok.split_tokens_on_unicode(list(tokens))
    words, word_tokens = [], []
    for subword, subword_tokens in zip(subwords, subword_tokens_list):
        special = subword_tokens[0] >= tok.eot
        with_space = subword == " "
        # the reference computes (and ignores) a `punctuation` flag here —
        # preserved quirk: punctuation glues onto the previous word
        if special or with_space or len(words) == 0:
            words.append(subword)
            word_tokens.append(list(subword_tokens))
        else:
            words[-1] = words[-1] + subword
            word_tokens[-1].extend(subword_tokens)
    return words, word_tokens


def _ref_remove_punctuation(text):
    # reference body with num2words(int(w)) supplied by our numwords (pinned
    # against published num2words outputs in the tests above)
    punct = _string.punctuation.replace("'", "")
    text = text.translate(str.maketrans("", "", punct))
    normalized = []
    for wrd in text.split():
        if wrd.isdigit():
            wrd = numwords.num_to_words(int(wrd))
        normalized.append(wrd.strip(_string.punctuation))
    text = " ".join(normalized)
    return text.translate(str.maketrans("", "", punct))


_FUZZ_VOCAB = ["the", "cat", "sat", "it's", "DOG", "42", "1,001", "re-do",
               "naïve", "café", "...", "!?", "a", "7", "100", "end."]


@pytest.mark.parametrize("seed", range(20))
def test_retokenize_fuzz_vs_reference_loops(seed):
    rng = np.random.default_rng(300 + seed)
    tok = get_test_tokenizer()
    text = " ".join(str(rng.choice(_FUZZ_VOCAB))
                    for _ in range(int(rng.integers(0, 12))))

    assert (retokenize.remove_punctuation(text)
            == _ref_remove_punctuation(text)), text

    clean = retokenize.remove_punctuation(text)
    got_ids = retokenize.encode(clean, tok, "char")
    assert got_ids == _ref_char_encode(clean, tok), clean

    ids = list(got_ids) + [tok.eot]
    got_w, got_t = retokenize.split_tokens_on_spaces(ids, tok, "char")
    want_w, want_t = _ref_char_split(ids, tok)
    assert got_w == want_w and got_t == want_t, clean
