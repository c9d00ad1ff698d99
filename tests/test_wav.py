"""WAV decode: NumPy parser and optional C++ fast path, round-trip fixtures."""

import os
import struct

import numpy as np
import pytest

from whisper_char_alignment_tpu.audio import wav, _wavio_native


def _sine(n=16000, ch=1):
    t = np.arange(n) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    return np.tile(x, (ch, 1))


def test_pcm16_roundtrip(tmp_path):
    x = _sine()
    p = str(tmp_path / "a.wav")
    wav.save(p, x, 16000)
    y, sr = wav.load(p)
    assert sr == 16000
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32768 + 1e-6)


def test_stereo_shape(tmp_path):
    x = _sine(ch=2)
    x[1] *= 0.25
    p = str(tmp_path / "s.wav")
    wav.save(p, x, 16000)
    y, sr = wav.load(p)
    assert y.shape == (2, 16000)
    np.testing.assert_allclose(y[1], x[1], atol=1e-3)


def test_float32_wav(tmp_path):
    # hand-roll an IEEE-float WAV and decode it
    import struct
    x = _sine()[0]
    pcm = x.astype("<f4").tobytes()
    p = str(tmp_path / "f.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)
    y, sr = wav.load(p)
    np.testing.assert_allclose(y[0], x, atol=1e-7)


def test_numpy_vs_native_parity(tmp_path):
    native = _wavio_native.get()
    if native is None:
        pytest.skip("native wavio not available")
    x = _sine(n=12345)
    p = str(tmp_path / "n.wav")
    wav.save(p, x, 16000)
    with open(p, "rb") as f:
        y_np, sr_np = wav._parse_wav(f.read())
    y_c, sr_c = native.load(p)
    assert sr_np == sr_c
    np.testing.assert_allclose(y_np, y_c, atol=1e-7)


def _write_wav(path, fmt_tag, bits, payload, channels=1, rate=16000):
    import struct
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack(
            "<IHHIIHH", 16, fmt_tag, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)


def test_pcm24_decode(tmp_path):
    x = np.array([0.5, -0.25, 0.0, 0.999], np.float64)
    as24 = np.clip(x * (1 << 23), -(1 << 23), (1 << 23) - 1).astype(np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in as24)
    p = str(tmp_path / "p24.wav")
    _write_wav(p, 1, 24, raw)
    y, sr = wav.load(p)
    np.testing.assert_allclose(y[0], x, atol=1e-6)


def test_pcm8_decode(tmp_path):
    raw = bytes([128, 255, 0, 192])  # 0.0, ~1.0, -1.0, 0.5
    p = str(tmp_path / "p8.wav")
    _write_wav(p, 1, 8, raw)
    y, sr = wav.load(p)
    np.testing.assert_allclose(y[0], [0.0, 127 / 128, -1.0, 0.5], atol=1e-6)


def test_pcm32_decode(tmp_path):
    x = np.array([0.5, -0.5], np.float64)
    raw = (x * (1 << 31)).astype("<i4").tobytes()
    p = str(tmp_path / "p32.wav")
    _write_wav(p, 1, 32, raw)
    y, sr = wav.load(p)
    np.testing.assert_allclose(y[0], x, atol=1e-6)


def test_extensible_format_treated_as_pcm(tmp_path):
    x = np.array([0.25, -0.75], np.float64)
    raw = np.round(x * 32768).astype("<i2").tobytes()
    p = str(tmp_path / "ext.wav")
    _write_wav(p, 0xFFFE, 16, raw)
    y, sr = wav.load(p)
    np.testing.assert_allclose(y[0], x, atol=1e-4)


def test_extensible_float_reads_subformat_guid(tmp_path):
    """Round-4 review: WAVE_FORMAT_EXTENSIBLE carries the REAL format code in
    the SubFormat GUID (offset 24 of the fmt body); assuming PCM silently
    decoded extensible IEEE-float WAVs (common DAW/sox output) into garbage.
    Both the NumPy parser and the C++ decoder must read the GUID."""
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(800) / 16000)).astype(
        np.float32)
    pcm = x.astype("<f4").tobytes()
    sub = (struct.pack("<H", 3)  # IEEE float
           + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 64000, 4, 32)
           + struct.pack("<HHI", 22, 32, 0) + sub)
    p = str(tmp_path / "extf.wav")
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)

    os.environ["WCA_DISABLE_NATIVE"] = "1"
    try:
        y_np, sr = wav.load(p)
    finally:
        del os.environ["WCA_DISABLE_NATIVE"]
    np.testing.assert_allclose(y_np[0], x, atol=1e-6)
    assert sr == 16000
    native = wav._wavio_native.get()
    if native is not None:
        y_nat, sr2 = wav.load(p)
        np.testing.assert_allclose(y_nat[0], x, atol=1e-6)
        assert sr2 == 16000


def test_disable_native_gate_is_falsy_aware(monkeypatch):
    """Round-4 review: WCA_DISABLE_NATIVE=0 must mean ENABLED (any non-empty
    string previously disabled the native paths)."""
    from whisper_char_alignment_tpu.utils import native as native_lib

    for off in ("0", "off", "false", ""):
        monkeypatch.setenv("WCA_DISABLE_NATIVE", off)
        assert not native_lib.disabled()
    for on in ("1", "true", "yes"):
        monkeypatch.setenv("WCA_DISABLE_NATIVE", on)
        assert native_lib.disabled()
        assert _wavio_native.get() is None


def test_reject_garbage(tmp_path):
    p = str(tmp_path / "g.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav file at all")
    os.environ["WCA_DISABLE_NATIVE"] = "1"
    try:
        with pytest.raises(ValueError):
            wav.load(p)
    finally:
        del os.environ["WCA_DISABLE_NATIVE"]
