"""Tokenizer behavior contracts: BPE round-trips, special-token layout, word
splitting, and the retokenize char pipeline (reference: retokenize.py semantics)."""

import numpy as np
import pytest

from whisper_char_alignment_tpu.text import bpe as bpe_mod
from whisper_char_alignment_tpu.text import retokenize
from whisper_char_alignment_tpu.text.tokenizer import (
    LANGUAGES, WhisperTokenizer, get_test_tokenizer, get_tokenizer)


@pytest.fixture(scope="module")
def tok():
    return get_test_tokenizer()


# -- pre-tokenizer -----------------------------------------------------------

@pytest.mark.parametrize("text,expect", [
    ("hello world", ["hello", " world"]),
    ("it's fine", ["it", "'s", " fine"]),
    ("abc123 def", ["abc", "123", " def"]),
    ("a  b", ["a", " ", " b"]),        # \s+(?!\S) leaves one space for ' b'
    ("a   b", ["a", "  ", " b"]),
    ("trailing  ", ["trailing", "  "]),
    ("!? ok", ["!?", " ok"]),
    (" leading", [" leading"]),
    ("don't I'll we've", ["don", "'t", " I", "'ll", " we", "'ve"]),
])
def test_pre_tokenize(text, expect):
    assert bpe_mod.pre_tokenize(text) == expect


def test_pre_tokenize_reassembles(tok):
    for text in ["hello, world! it's 42 degrees...", "  spaces   galore  ",
                 "mixed CASE and 123numbers"]:
        assert "".join(bpe_mod.pre_tokenize(text)) == text


# -- BPE round trips ---------------------------------------------------------

@pytest.mark.parametrize("text", [
    "the quick brown fox", "artificial intelligence is for real",
    "punctuation, everywhere!", "unicode: naïve café 日本語",
    "numbers 12345 and CAPS",
])
def test_bpe_roundtrip(tok, text):
    ids = tok.encode(text)
    assert tok.decode(ids) == text


def test_bpe_python_vs_native_parity():
    ranks = bpe_mod.toy_ranks()
    b = bpe_mod.ByteBPE(ranks)
    native = b._get_native()
    if native is None:
        pytest.skip("native BPE unavailable")
    texts = ["the quick brown fox", "greasy wash water all year",
             "unicode: naïve café 日本語", "it's real"]
    for text in texts:
        pieces = [p.encode("utf-8") for p in bpe_mod.pre_tokenize(text)]
        got = native.encode_pieces(pieces)
        expect = []
        for p in pieces:
            expect.extend(b._bpe_merge(p))
        assert got == expect, text


def test_native_bpe_rejects_corrupt_blobs():
    """The C++ table loader must fail LOUDLY (null handle -> Python fallback)
    on any inconsistent blob — a silently truncated table would encode
    differently from the pure-Python merge with no signal."""
    import ctypes
    import struct

    from whisper_char_alignment_tpu.text import _bpe_native

    lib = _bpe_native._get_lib()
    if lib is None:
        pytest.skip("native BPE unavailable")
    bad_blobs = [
        b"",                                     # empty
        b"\x01\x02\x03",                         # shorter than the header
        struct.pack("<q", 3) + struct.pack("<i", 1) + b"a"
        + struct.pack("<i", 7),                  # claims 3 entries, has 1
        struct.pack("<q", 1) + struct.pack("<i", -5) + b"abcd"
        + struct.pack("<i", 7),                  # negative entry length
        struct.pack("<q", 2 ** 40),              # absurd count, no entries
    ]
    for blob in bad_blobs:
        assert lib.bpe_new(blob, len(blob)) is None, blob
    # a well-formed blob still loads (the validation is not over-strict)
    ok = struct.pack("<q", 1) + struct.pack("<i", 1) + b"a" + struct.pack("<i", 0)
    h = lib.bpe_new(ok, len(ok))
    assert h
    lib.bpe_free(h)


def test_native_bpe_concurrent_encode_is_correct():
    """The native core shares one fixed output buffer per NativeBPE; without
    the per-instance lock, two threads' ids interleave SILENTLY. The
    pure-Python ByteBPE is thread-safe, so the native path must be too."""
    import threading

    b = bpe_mod.ByteBPE(bpe_mod.toy_ranks())
    if b._get_native() is None:
        pytest.skip("native BPE unavailable")
    texts = ["the quick brown fox jumps over the lazy dog " * 20,
             "greasy wash water all year and then some " * 20]
    expect = [b.encode_ordinary(t) for t in texts]
    errors = []

    def worker(idx):
        try:
            for _ in range(50):
                assert b.encode_ordinary(texts[idx]) == expect[idx]
        except Exception as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors


def test_overlong_piece_falls_back_to_python_merge():
    """Round-4 review: the native core bounds its output to 4096 ids/piece;
    a longer unmergeable piece ('z'*5000 — no zz merge in the toy vocab) must
    fall back to the pure-Python merge instead of raising."""
    b = bpe_mod.ByteBPE(bpe_mod.toy_ranks())
    text = "z" * 5000
    ids = b.encode_ordinary(text)
    assert b.decode(ids) == text
    assert ids == b._bpe_merge(text.encode("utf-8"))


def test_bpe_merges_actually_fire(tok):
    # toy vocab has merges learned from a corpus containing 'the'
    ids = tok.encode("the")
    assert len(ids) < 3


# -- special token layout ----------------------------------------------------

def test_special_layout_offsets(tok):
    base = tok.bpe.n_vocab
    assert tok.eot == base
    assert tok.sot == base + 1
    assert tok.translate == base + 2 + 99
    assert tok.transcribe == tok.translate + 1
    # after transcribe: sot_lm, sot_prev, no_speech, no_timestamps
    assert tok.no_timestamps == tok.transcribe + 4
    assert tok.timestamp_begin == tok.no_timestamps + 1
    assert tok.n_vocab == tok.timestamp_begin + 1501


def test_published_id_arithmetic():
    """With the published base vocab sizes, the REAL WhisperTokenizer layout
    derivation must land every special on the known published id (multilingual
    eot=50257, sot=50258, ...; English eot=50256). Drives __post_init__
    through a stub rank table of the published size — constant-vs-constant
    arithmetic would pass under any layout bug."""

    class _StubBPE:
        def __init__(self, n_vocab):
            self.n_vocab = n_vocab

    t = WhisperTokenizer(_StubBPE(50257), multilingual=True)
    assert t.eot == 50257
    assert t.sot == 50258
    assert t.translate == 50358
    assert t.transcribe == 50359
    assert t.sot_lm == 50360
    assert t.sot_prev == 50361
    assert t.no_speech == 50362
    assert t.no_timestamps == 50363
    assert t.timestamp_begin == 50364
    assert t.n_vocab == 51865  # matches config MODEL_DIMS vocab
    assert t.language_token == 50259  # <|en|> is the first language token

    te = WhisperTokenizer(_StubBPE(50256), multilingual=False)
    assert te.eot == 50256
    assert te.sot == 50257
    assert te.no_timestamps == 50362
    assert te.timestamp_begin == 50363

    # large-v3 family: cantonese appended -> every id after the language
    # block shifts by one
    t3 = WhisperTokenizer(_StubBPE(50257), multilingual=True, n_languages=100)
    assert t3.translate == 50359
    assert t3.timestamp_begin == 50365


def test_sot_sequence_multilingual(tok):
    assert tok.sot_sequence == (tok.sot, tok.language_token, tok.transcribe)
    assert tok.sot_sequence_including_notimestamps == tok.sot_sequence + (
        tok.no_timestamps,)


def test_sot_sequence_english_only():
    t = get_test_tokenizer(multilingual=False)
    t.language = None
    t.task = None
    assert t.sot_sequence == (t.sot,)


def test_language_token_order(tok):
    codes = tok.all_language_codes
    assert codes[0] == "en" and codes[1] == "zh" and len(codes) == 99
    assert tok.language_token == tok.sot + 1  # en is the first language


def test_decode_filters_timestamps(tok):
    ids = tok.encode("hi") + [tok.timestamp_begin + 50]
    assert tok.decode(ids) == "hi"
    assert tok.decode_with_timestamps(ids) == "hi<|1.00|>"


def test_decode_renders_specials(tok):
    ids = tok.encode("ok") + [tok.eot]
    assert tok.decode(ids) == "ok<|endoftext|>"


# -- word splitting ----------------------------------------------------------

def test_split_tokens_on_unicode_multibyte(tok):
    text = " café 日本"
    ids = tok.encode(text)
    words, word_tokens = tok.split_tokens_on_unicode(ids)
    assert "".join(words) == text
    assert sum(word_tokens, []) == ids
    # every piece must be valid unicode (no dangling replacement chars)
    assert all("�" not in w for w in words)


def test_split_to_word_tokens(tok):
    text = " hello world again"
    ids = tok.encode(text)
    words, word_tokens = tok.split_to_word_tokens(ids)
    assert [w for w in words] == [" hello", " world", " again"]
    assert sum(word_tokens, []) == ids


def test_split_words_with_eot(tok):
    ids = tok.encode(" one two") + [tok.eot]
    words, word_tokens = tok.split_to_word_tokens(ids)
    assert words[-1] == "<|endoftext|>"
    assert word_tokens[-1] == [tok.eot]


# -- retokenize char pipeline (reference retokenize.py semantics) -------------

def test_char_encode_roundtrip(tok):
    text = "artificial intelligence is for real"
    ids = retokenize.encode(text, tok, "char")
    assert tok.decode(ids) == text


def test_char_encode_space_tokens_between_words(tok):
    ids = retokenize.encode("ab cd", tok, "char")
    space = tok.encode(" ")
    # per-char tokens with explicit space tokens between words
    assert ids.count(space[0]) == 1


def test_char_split_tokens_on_spaces(tok):
    text = "artificial intelligence is for real"
    ids = retokenize.encode(text, tok, "char") + [tok.eot]
    words, word_tokens = retokenize.split_tokens_on_spaces(ids, tok, "char")
    # reference semantics: a space token starts a new group and the following
    # word's chars merge into it, so each word after the first leads with a space
    assert words == ["artificial", " intelligence", " is", " for", " real",
                     "<|endoftext|>"]
    assert [len(t) for t in word_tokens] == [10, 13, 3, 4, 5, 1]
    assert sum(word_tokens, []) == ids


def test_word_boundary_cumsum_matches_reference_recipe(tok):
    """End-to-end word-token bookkeeping used by force_align (timing.py:105-113)."""
    text = "hi there world"
    text_tokens = retokenize.encode(text, tok, "char")
    words, word_tokens = retokenize.split_tokens_on_spaces(
        text_tokens + [tok.eot], tok, "char")
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))
    assert word_boundaries[0] == 0
    assert word_boundaries[-1] == len(text_tokens)


def test_non_speech_tokens_nonempty(tok):
    nst = tok.non_speech_tokens
    assert len(nst) > 5
    assert all(isinstance(i, int) for i in nst)


def test_get_tokenizer_language_aliases():
    with pytest.raises(FileNotFoundError):
        get_tokenizer(True, language="English", tokenizer_dir="/nonexistent")
    with pytest.raises(ValueError):
        get_tokenizer(True, language="klingon", tokenizer_dir="/nonexistent")


def test_gpt2_vocab_json_loader(tmp_path):
    """vocab.json (unicode-mapped strings) must load to the same ranks as the
    tiktoken format."""
    import json

    ranks = bpe_mod.toy_ranks()
    b2u = bpe_mod._bytes_to_unicode()
    vocab = {"".join(b2u[b] for b in k): v for k, v in ranks.items()}
    p = tmp_path / "vocab.json"
    with open(p, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    loaded = bpe_mod.ByteBPE.from_gpt2_files(str(p))
    assert loaded.ranks == ranks
    ref = bpe_mod.ByteBPE(ranks)
    for text in ["the quick brown fox", "naïve café"]:
        assert loaded.encode_ordinary(text) == ref.encode_ordinary(text)


def test_gpt2_vocab_json_specials_excluded_from_base_ranks(tmp_path):
    """Real GPT-2/HF vocab.json files include ``<|endoftext|>`` (and whisper
    dumps add ``<|startoftranscript|>``, ``<|en|>``, ...) as ordinary entries.
    They decode cleanly through the byte map (printable ASCII), so a KeyError
    filter alone does NOT drop them — and every special id the Tokenizer
    derives from n_vocab would shift off the checkpoint's trained ids."""
    import json

    ranks = bpe_mod.toy_ranks()
    n_base = max(ranks.values()) + 1
    b2u = bpe_mod._bytes_to_unicode()
    vocab = {"".join(b2u[b] for b in k): v for k, v in ranks.items()}
    vocab["<|endoftext|>"] = n_base
    vocab["<|startoftranscript|>"] = n_base + 1
    vocab["<|en|>"] = n_base + 2
    p = tmp_path / "vocab.json"
    with open(p, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    loaded = bpe_mod.ByteBPE.from_gpt2_files(str(p))
    assert loaded.ranks == ranks
    assert loaded.n_vocab == n_base  # eot = n_vocab lands on the trained id
    t = WhisperTokenizer(loaded, multilingual=False)
    assert t.eot == n_base


def test_bytes_to_unicode_is_reversible():
    m = bpe_mod._bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("a")] == "a" and m[32] != " "  # space remaps (not printable)


def test_tiktoken_file_loader(tmp_path):
    import base64
    ranks = bpe_mod.toy_ranks()
    p = tmp_path / "multilingual.tiktoken"
    with open(p, "wb") as f:
        for k, v in ranks.items():
            f.write(base64.b64encode(k) + b" " + str(v).encode() + b"\n")
    t = get_tokenizer(True, language="English", tokenizer_dir=str(tmp_path))
    assert t.language == "en" and t.task == "transcribe"
    assert t.decode(t.encode("hello world")) == "hello world"
