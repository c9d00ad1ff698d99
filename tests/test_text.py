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
