"""m4a/AAC decode tests: the system-codec shim (native/m4a_decoder.cc,
libavformat/libavcodec — the same backend the reference's torchaudio m4a
path uses, reference velocity_asr/audio.py:39-56) wired through
io.decode_audio_file and the audio loader.

AAC is lossy and its encoder adds priming samples (the mp4 edit list may
or may not trim them depending on muxer defaults), so tests check
best-lag correlation against the source signal rather than sample
equality, with a generous lag window."""

import numpy as np
import pytest

from velocity_asr_tpu import io as va_io

needs_m4a = pytest.mark.skipif(
    not va_io.m4a_available(), reason="system libav* stack not available"
)


def tone(n, rate, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1873 * t)
         + 0.02 * rng.standard_normal(n))
    return np.clip(x, -0.95, 0.95).astype(np.float32)


def best_lag_corr(ref, dec, max_lag=4096):
    """Max normalized cross-correlation of dec against ref over leading
    lags (AAC priming shifts the decoded signal later)."""
    n = min(len(ref), len(dec))
    best = -1.0
    for lag in range(0, max_lag, 8):
        a = ref[: n - lag]
        b = dec[lag:n]
        denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
        best = max(best, float(np.dot(a, b) / denom))
    return best


@needs_m4a
@pytest.mark.parametrize("rate", [16000, 44100])
def test_m4a_roundtrip_correlation(tmp_path, rate):
    sig = tone(2 * rate, rate)
    path = str(tmp_path / "t.m4a")
    va_io.encode_m4a(path, sig, rate)
    data, got_rate = va_io.decode_audio_file(path)
    assert got_rate == rate
    assert data.shape[0] == 1
    # AAC pads to whole 1024-sample frames and may keep priming samples.
    assert abs(data.shape[1] - len(sig)) <= 4096
    assert best_lag_corr(sig, data[0]) > 0.98


@needs_m4a
def test_m4a_content_sniffing(tmp_path):
    """Extensionless m4a bodies (the serve daemon's case) dispatch on the
    ISO-BMFF 'ftyp' magic, not the filename."""
    rate = 16000
    sig = tone(rate, rate)
    src = str(tmp_path / "t.m4a")
    va_io.encode_m4a(src, sig, rate)
    body = tmp_path / "request.body"
    body.write_bytes(open(src, "rb").read())
    data, got_rate = va_io.decode_audio_file(str(body))
    assert got_rate == rate and data.shape[0] == 1


@needs_m4a
def test_m4a_through_audio_loader(tmp_path):
    """load_audio resamples a 44.1 kHz m4a to the 16 kHz model rate
    (reference velocity_asr/audio.py:39-56 resample-on-load)."""
    from velocity_asr_tpu.audio import SAMPLE_RATE, load_audio

    rate = 44100
    sig = tone(2 * rate, rate)
    path = str(tmp_path / "t.m4a")
    va_io.encode_m4a(path, sig, rate)
    out = np.asarray(load_audio(path))
    expected = int(round(2 * rate * SAMPLE_RATE / rate))
    assert abs(len(out) - expected) <= 4096 * SAMPLE_RATE / rate + 2
    ref16 = tone(2 * SAMPLE_RATE, SAMPLE_RATE)
    # Resampled audio correlates with a same-pitch 16 kHz reference tone.
    assert best_lag_corr(ref16, out) > 0.9


@needs_m4a
def test_m4a_garbage_fails_cleanly(tmp_path):
    p = tmp_path / "bad.m4a"
    p.write_bytes(b"\x00\x00\x00\x18ftypM4A " + b"\x00" * 256)
    with pytest.raises((ValueError, RuntimeError)):
        va_io.decode_audio_file(str(p))


@needs_m4a
def test_m4a_advertised(tmp_path):
    exts = va_io.supported_audio_exts()
    assert ".m4a" in exts and ".mp4" in exts
