"""Fuzz the BPE engine against the real tiktoken Rust core.

The riskiest transcript-parity component is the hand-rolled GPT-2 pre-tokenizer
scanner + merge loop (text/bpe.py) that replaces tiktoken (reference dependency
#13, SURVEY.md §2b; whisper builds its tokenizers with the GPT-2 pattern). The
installed tiktoken package needs no network when given an explicit rank dict, so
the scanner and both merge engines (pure Python and the C++ core) are fuzzed
against the real Rust engine with the real pattern over adversarial unicode:
contractions, multi-byte scripts, digit runs, whitespace-before-nonspace,
separator control chars (\\x1c-\\x1f, where Python's str.isspace() disagrees
with the regex \\s = Unicode White_Space), emoji, and combining marks.
"""

import random

import pytest

tiktoken = pytest.importorskip("tiktoken")

from whisper_char_alignment_tpu.text.bpe import ByteBPE, pre_tokenize, toy_ranks

# the pattern whisper passes to tiktoken for both gpt2 and multilingual vocabs
GPT2_PAT = (r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
            r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

_POOLS = [
    "abcdefghijklmnopqrstuvwxyzABCDE",
    "0123456789０１２３٤٥",
    ".,!?;:'\"-()[]{}#@&%$€№“”",
    " \t\n\r\xa0  　\x1c\x1d\x1e\x85​",
    "日本語中文한국어",
    "éüñßàç",
    "🙂😀👍",
    "'s 't 're 've 'm 'll 'd",
]


def _rand_string(rng: random.Random) -> str:
    return "".join(rng.choice(rng.choice(_POOLS))
                   for _ in range(rng.randrange(0, 40)))


def _fuzz_ranks(rng: random.Random) -> dict:
    """256 bytes + trained toy merges + adversarial merges: random substrings of
    a unicode-rich corpus (stresses multi-byte boundaries) and whitespace pairs
    (exposes pre-token split differences that single-byte fallbacks would hide)."""
    ranks = toy_ranks(200)
    next_rank = max(ranks.values()) + 1
    corpus = ("the quick brown fox does not jump 42 times 日本語テスト über "
              "naïve   spaces\t\ttabs\xa0nbsp ' ls' 🙂😀 №๓௭ ½¾ “quotes” "
              "won't we'll").encode("utf-8")
    for _ in range(400):
        i = rng.randrange(len(corpus) - 1)
        piece = corpus[i:i + rng.randrange(2, 7)]
        if piece not in ranks:
            ranks[piece] = next_rank
            next_rank += 1
    for piece in (b"  ", b"   ", b"\t\t", b" \t", b"\xc2\xa0 ", b" \x1c",
                  b"\x1c\x1c", b"''", b"'s'", b"e'"):
        if piece not in ranks:
            ranks[piece] = next_rank
            next_rank += 1
    return ranks


@pytest.fixture(scope="module")
def fuzz_setup():
    rng = random.Random(0)
    ranks = _fuzz_ranks(rng)
    enc = tiktoken.Encoding("fuzz", pat_str=GPT2_PAT,
                            mergeable_ranks=ranks, special_tokens={})
    strings = [_rand_string(rng) for _ in range(10_000)]
    # seed with the structured cases regardless of what the rng draws
    strings += [
        "", " ", "  ", "don't you've I'll we're", "  leading", "trail   ",
        "a\t\tb", "\x1c\x1d x", "a\x1cb", " \x1ca", "nb\xa0sp", "42 dogs 3.14",
        "日本語テスト", "é über naïve", "🙂 emoji", "mixed日本abc123",
        "'s's's", "a'sb", " 'll", "...!!!", "a  b   c", "\n\n\nx",
        " ogham", "ゼロ幅​スペース",
    ]
    expected = [enc.encode_ordinary(s) for s in strings]
    return ranks, strings, expected


def test_python_engine_matches_tiktoken(fuzz_setup):
    ranks, strings, expected = fuzz_setup
    ours = ByteBPE(dict(ranks))
    ours._native_tried = True  # force the pure-Python merge loop
    ours._native = None
    mismatches = [s for s, want in zip(strings, expected)
                  if ours.encode_ordinary(s) != want]
    assert not mismatches, (len(mismatches), mismatches[:5])


def test_native_engine_matches_tiktoken(fuzz_setup):
    ranks, strings, expected = fuzz_setup
    ours = ByteBPE(dict(ranks))
    if ours._get_native() is None:
        pytest.skip("C++ BPE core not built")
    mismatches = [s for s, want in zip(strings, expected)
                  if ours.encode_ordinary(s) != want]
    assert not mismatches, (len(mismatches), mismatches[:5])


def test_pre_tokenize_concatenation_invariant(fuzz_setup):
    """The scanner must partition the input: pieces concatenate to the input."""
    _, strings, _ = fuzz_setup
    for s in strings[:2000]:
        assert "".join(pre_tokenize(s)) == s


def test_decode_roundtrip(fuzz_setup):
    ranks, strings, expected = fuzz_setup
    ours = ByteBPE(dict(ranks))
    for s, ids in zip(strings[:2000], expected[:2000]):
        assert ours.decode(ids) == s
