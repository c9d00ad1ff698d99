"""Character/subword re-tokenization and text normalization.

Re-implements the reference's retokenize module (reference: retokenize.py) on top of
our tokenizer. ``encode`` emits a char-level token stream with explicit space tokens
between words; ``split_tokens_on_spaces`` inverts unicode-split tokens back into
words; ``remove_punctuation`` strips punctuation (keeping apostrophes) and spells out
digit-only words.
"""

from __future__ import annotations

import string

from .numwords import num_to_words


def encode(text, tokenizer, aligned_unit_type: str = "subword"):
    """Tokenize ``text`` as subwords or as per-character tokens with explicit space
    tokens between words (reference: retokenize.py:5-17)."""
    assert aligned_unit_type in ("char", "subword")
    if aligned_unit_type == "subword":
        return tokenizer.encode(text)
    tokens = []
    space_id = tokenizer.encode(" ")
    wrds = text.split()
    for i, wrd in enumerate(wrds):
        for c in wrd:
            tokens += tokenizer.encode(c)
        if i < len(wrds) - 1:
            tokens += space_id
    return tokens


def split_tokens_on_spaces(tokens, tokenizer, aligned_unit_type: str = "subword"):
    """Group unicode-split tokens back into words (reference: retokenize.py:19-39).

    Subword mode delegates to the tokenizer's word splitter. Char mode starts a new
    word on special tokens and exact-space subwords (note: unlike the tokenizer's own
    ``split_tokens_on_spaces``, punctuation does NOT start a new word here — the
    reference computes ``punctuation`` at retokenize.py:31 but never uses it, and we
    preserve that behavior).
    """
    assert aligned_unit_type in ("char", "subword")
    if aligned_unit_type == "subword":
        return tokenizer.split_to_word_tokens(tokens)

    subwords, subword_tokens_list = tokenizer.split_tokens_on_unicode(tokens)
    words = []
    word_tokens = []
    for subword, subword_tokens in zip(subwords, subword_tokens_list):
        special = subword_tokens[0] >= tokenizer.eot
        with_space = subword == " "
        if special or with_space or len(words) == 0:
            words.append(subword)
            word_tokens.append(list(subword_tokens))
        else:
            words[-1] = words[-1] + subword
            word_tokens[-1].extend(subword_tokens)
    return words, word_tokens


_PUNCT_NO_APOSTROPHE = string.punctuation.replace("'", "")
_DELETE_PUNCT = str.maketrans("", "", _PUNCT_NO_APOSTROPHE)


def remove_punctuation(text: str) -> str:
    """Strip punctuation (keeping apostrophes) and normalize digit-only words to
    spelled-out English (reference: retokenize.py:41-50).

    The trailing translate also strips hyphens/commas introduced by the number
    speller ("42" -> "forty-two" -> "fortytwo"), matching the reference exactly.
    """
    text = text.translate(_DELETE_PUNCT)
    normalized = []
    for wrd in text.split():
        if wrd.isdigit():
            wrd = num_to_words(int(wrd))
        normalized.append(wrd.strip(string.punctuation))
    text = " ".join(normalized)
    return text.translate(_DELETE_PUNCT)
