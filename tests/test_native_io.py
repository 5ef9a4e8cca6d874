"""Native C++ audio decoder tests: FLAC (via the test-fixture encoder) and
WAV roundtrips through the ctypes interface."""

import os
import wave

import numpy as np
import pytest

from velocity_asr_tpu import io as va_io
from tests.flac_encoder import encode_flac

needs_native = pytest.mark.skipif(
    not va_io.native_available(), reason="native decoder not built (make -C native)"
)


def make_pcm(n=5000, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    pcm = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
    if channels == 2:
        pcm = np.stack([pcm, (pcm * 0.5).astype(np.int16)], axis=1)
    return pcm


@needs_native
@pytest.mark.parametrize("mode", ["fixed2", "verbatim"])
def test_flac_mono_roundtrip(tmp_path, mode):
    pcm = make_pcm()
    path = str(tmp_path / f"test_{mode}.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, mode=mode))
    data, rate = va_io.decode_audio_file(path)
    assert rate == 16000
    assert data.shape == (1, len(pcm))
    np.testing.assert_allclose(data[0], pcm.astype(np.float32) / 32768.0, atol=1e-6)


@needs_native
def test_flac_constant_subframe(tmp_path):
    pcm = np.full(3000, 1234, np.int16)
    path = str(tmp_path / "const.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, mode="constant"))
    data, rate = va_io.decode_audio_file(path)
    np.testing.assert_allclose(data[0], 1234 / 32768.0, atol=1e-6)


@needs_native
def test_flac_stereo_independent(tmp_path):
    pcm = make_pcm(4000, channels=2)
    path = str(tmp_path / "stereo.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, mode="fixed2"))
    data, rate = va_io.decode_audio_file(path)
    assert data.shape == (2, 4000)
    np.testing.assert_allclose(data.T, pcm.astype(np.float32) / 32768.0, atol=1e-6)


@needs_native
def test_flac_left_side_stereo(tmp_path):
    pcm = make_pcm(4096, channels=2, seed=3)
    path = str(tmp_path / "ls.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, mode="fixed2", stereo_mode="left_side"))
    data, rate = va_io.decode_audio_file(path)
    np.testing.assert_allclose(data.T, pcm.astype(np.float32) / 32768.0, atol=1e-6)


@needs_native
def test_flac_odd_tail_block(tmp_path):
    # total not a multiple of block_size exercises the short last frame
    pcm = make_pcm(2500, seed=7)
    path = str(tmp_path / "tail.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, block_size=1024, mode="fixed2"))
    data, _ = va_io.decode_audio_file(path)
    assert data.shape[1] == 2500
    np.testing.assert_allclose(data[0], pcm.astype(np.float32) / 32768.0, atol=1e-6)


@needs_native
def test_wav_native_matches_python(tmp_path):
    pcm = make_pcm(3000)
    path = str(tmp_path / "x.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    native, rate_n = va_io._decode_native(path)
    pyth, rate_p = va_io._decode_wav_python(path)
    assert rate_n == rate_p == 16000
    np.testing.assert_allclose(native, pyth, atol=1e-7)


@needs_native
def test_corrupt_file_raises(tmp_path):
    path = str(tmp_path / "bad.flac")
    with open(path, "wb") as f:
        f.write(b"fLaC" + b"\x00" * 10)
    with pytest.raises(ValueError):
        va_io.decode_audio_file(path)


def test_load_audio_resamples(tmp_path):
    # 8 kHz WAV -> load_audio resamples to 16 kHz (python fallback path ok)
    t = np.arange(8000) / 8000
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    path = str(tmp_path / "8k.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    from velocity_asr_tpu.audio import load_audio

    out = load_audio(path)
    assert abs(len(out) - 16000) <= 2


def test_unsupported_format_fails_fast(tmp_path):
    """Formats no decoder handles must fail immediately with an
    actionable message, not a decoder crash. (mp3/ogg are decodable via
    native/mp3_decoder.cc / vorbis_decoder.cc; m4a via the system-codec
    shim where the libav* stack exists.)"""
    p = tmp_path / "music.aiff"
    p.write_bytes(b"FORM\x00\x00\x00\x30AIFF" + b"\x00" * 64)
    with pytest.raises(RuntimeError, match="unsupported format.*ffmpeg"):
        va_io.decode_audio_file(str(p))
    if not va_io.m4a_available():
        q = tmp_path / "music.m4a"
        # minimal MP4 'ftyp' box header
        q.write_bytes(b"\x00\x00\x00\x18ftypM4A " + b"\x00" * 64)
        with pytest.raises(RuntimeError, match="ffmpeg"):
            va_io.decode_audio_file(str(q))


def test_unknown_extension_sniffs_content(tmp_path):
    """The serve daemon writes request bodies to extensionless temp files;
    decode must dispatch on magic bytes (RIFF/fLaC), not the filename."""
    t = np.arange(1600) / 16000
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    path = str(tmp_path / "body.audio")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    data, rate = va_io.decode_audio_file(path)
    assert rate == 16000 and data.shape[1] == 1600
    # garbage with an unknown extension still fails fast
    bad = tmp_path / "body2.audio"
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(RuntimeError, match="unsupported format"):
        va_io.decode_audio_file(str(bad))


def test_supported_exts_advertised():
    exts = va_io.supported_audio_exts()
    assert ".wav" in exts
    if va_io.native_available():
        assert ".flac" in exts
        assert ".mp3" in exts
        assert ".ogg" in exts
    assert (".m4a" in exts) == va_io.m4a_available()
    # the transcribe CLI advertises the same set
    from scripts.transcribe import AUDIO_EXTS

    assert tuple(AUDIO_EXTS) == exts


def _write_wav(path, fmt_tag, bits, payload, channels=1, rate=16000):
    import struct

    byte_rate = rate * channels * bits // 8
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate, byte_rate, block_align, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)


def test_python_fallback_decodes_float32_wav(tmp_path):
    """The pure-Python fallback must handle IEEE-float WAVs (format tag 3)
    exactly like the native decoder does, not reject or misread them."""
    rng = np.random.default_rng(3)
    samples = (rng.standard_normal(800) * 0.25).astype("<f4")
    path = str(tmp_path / "f32.wav")
    _write_wav(path, fmt_tag=3, bits=32, payload=samples.tobytes())
    data, rate = va_io._decode_wav_python(path)
    assert rate == 16000 and data.shape == (1, 800)
    np.testing.assert_allclose(data[0], samples, rtol=0, atol=0)


def test_python_fallback_decodes_extensible_wav(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping int16 PCM."""
    import struct

    pcm = (np.arange(-50, 50, dtype="<i2") * 100).astype("<i2")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    # cbSize + valid bits + channel mask + SubFormat GUID (PCM = 1)
    fmt += struct.pack("<HHI", 22, 16, 0x4)
    fmt += struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    payload = pcm.tobytes()
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    path = str(tmp_path / "ext.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
    data, rate = va_io._decode_wav_python(path)
    assert rate == 16000
    np.testing.assert_allclose(data[0], pcm.astype(np.float32) / 32768.0)


def test_python_fallback_rejects_misnamed_flac(tmp_path, monkeypatch):
    """Without the native build, a FLAC misnamed .wav must fail with the
    conversion hint, not an opaque RIFF parser error."""
    import pytest

    path = str(tmp_path / "fake.wav")
    with open(path, "wb") as f:
        f.write(b"fLaC" + bytes(64))
    monkeypatch.setattr(va_io, "native_available", lambda: False)
    with pytest.raises(RuntimeError, match="native decoder"):
        va_io.decode_audio_file(path)
