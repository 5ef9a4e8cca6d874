"""MP3 decoder tests: the from-scratch MPEG-1/2/2.5 Layer III decoder
(native/mp3_decoder.cc) against libmpg123 golden PCM on LAME-encoded
fixtures, plus wiring through io.decode_audio_file and the audio loader.

Parity target: the reference decodes mp3 via torchaudio (reference
velocity_asr/audio.py:39-56); here the native decoder handles it
directly. Comparison excludes ~2 granules at each edge: libmpg123
applies LAME-tag gapless trimming at stream boundaries, which is a
length/offset difference, not a decode difference — interior PCM must
match bit-closely (<1e-3 relative RMS; measured ~3e-7)."""

import numpy as np
import pytest

from velocity_asr_tpu import io as va_io
from tests.mp3_codec import (
    lame_available,
    lame_encode,
    mpg123_available,
    mpg123_decode,
)

needs_native = pytest.mark.skipif(
    not va_io.native_available(), reason="native decoder not built"
)
needs_lame = pytest.mark.skipif(not lame_available(), reason="no libmp3lame")
needs_mpg = pytest.mark.skipif(not mpg123_available(), reason="no libmpg123")


def tone_noise(n, rate, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1873 * t)
         + 0.05 * rng.standard_normal(n))
    return np.clip(x, -0.95, 0.95).astype(np.float32)


def click_noise(n, rate, seed=2):
    """Low noise + periodic transients: forces window switching
    (start/short/stop blocks) in the encoder."""
    rng = np.random.default_rng(seed)
    x = 0.01 * rng.standard_normal(n)
    x[:4000] *= np.linspace(0, 1, min(4000, n))[: min(4000, n)]
    for s in range(9000, n - 3000, 5000):
        k = min(150, n - s)
        x[s:s + k] += (np.sin(2 * np.pi * 2500 * np.arange(k) / rate)
                       * np.hanning(k) * 0.8)
    return x.astype(np.float32)


def _golden_compare(path, max_ratio=1e-3):
    """Decode `path` with both decoders; align (libmpg123 gapless-trims
    the LAME encoder/decoder delay, ours keeps it) and compare interior
    PCM."""
    ref, rref = mpg123_decode(path)
    got, rgot = va_io.decode_audio_file(path)
    assert rref == rgot
    ref2 = ref if ref.ndim == 2 else ref[:, None]   # (n, ch)
    got2 = got.T                                    # io gives (ch, n)
    assert got2.shape[1] == ref2.shape[1]           # channel count
    a0 = np.asarray(ref2[:, 0], np.float64)
    b0 = np.asarray(got2[:, 0], np.float64)
    best = None
    for lag in (0, 529, 576, 1105, 1152, 1681):
        m = min(len(a0), len(b0) - lag) - 2600
        if m < 4000:
            continue
        err = float(np.mean((b0[lag + 2304:lag + m] - a0[2304:m]) ** 2))
        if best is None or err < best[0]:
            best = (err, lag)
    assert best is not None, "fixture too short"
    lag = best[1]
    m = min(len(a0), len(b0) - lag)
    a = np.asarray(ref2[2304:m - 2600], np.float64)
    b = np.asarray(got2[lag + 2304:lag + m - 2600], np.float64)
    ratio = np.sqrt(np.mean((b - a) ** 2)) / max(np.sqrt(np.mean(a ** 2)), 1e-9)
    assert ratio < max_ratio, f"PCM mismatch vs libmpg123: {ratio:.2e}"
    return ratio


@needs_native
@needs_lame
@needs_mpg
@pytest.mark.parametrize(
    "rate", [44100, 48000, 32000, 22050, 24000, 16000, 12000, 11025, 8000]
)
def test_mono_rates_golden(tmp_path, rate):
    """All nine sample rates: MPEG-1 (44.1/48/32k), MPEG-2 LSF
    (22.05/24/16k), MPEG-2.5 (11.025/12/8k)."""
    path = str(tmp_path / f"m{rate}.mp3")
    brate = 96 if rate > 24000 else 48
    with open(path, "wb") as f:
        f.write(lame_encode(tone_noise(rate * 2, rate), rate, 1, brate))
    _golden_compare(path)


@needs_native
@needs_lame
@needs_mpg
@pytest.mark.parametrize("rate", [44100, 22050])
def test_transients_golden(tmp_path, rate):
    """Window-switching coverage: start/short/stop blocks plus heavy bit
    reservoir use."""
    path = str(tmp_path / f"t{rate}.mp3")
    with open(path, "wb") as f:
        f.write(lame_encode(click_noise(rate * 2, rate), rate, 1,
                            128 if rate > 30000 else 48))
    _golden_compare(path)


@needs_native
@needs_lame
@needs_mpg
@pytest.mark.parametrize("vbr", [False, True])
def test_stereo_golden(tmp_path, vbr):
    x = tone_noise(44100 * 2, 44100)
    st = np.stack([x, np.roll(x, 1000) * 0.8], axis=1)
    path = str(tmp_path / f"s{int(vbr)}.mp3")
    with open(path, "wb") as f:
        f.write(lame_encode(st, 44100, 2, 192, vbr=vbr))
    _golden_compare(path)


@needs_native
@needs_lame
def test_decode_shape_and_sniffing(tmp_path):
    """decode_audio_file returns (channels, samples); sniffing routes
    mp3 content under a wrong extension."""
    x = tone_noise(16000, 16000)
    raw = lame_encode(x, 16000, 1, 64)
    path = str(tmp_path / "a.mp3")
    with open(path, "wb") as f:
        f.write(raw)
    data, rate = va_io.decode_audio_file(path)
    assert rate == 16000 and data.shape[0] == 1
    # within a frame-size slack of the input length (codec delay/padding)
    assert abs(data.shape[1] - len(x)) < 4000
    odd = str(tmp_path / "a.bin")
    with open(odd, "wb") as f:
        f.write(raw)
    data2, rate2 = va_io.decode_audio_file(odd)
    assert rate2 == 16000 and data2.shape == data.shape


@needs_native
@needs_lame
def test_id3v2_header_skipped(tmp_path):
    x = tone_noise(16000, 16000)
    raw = lame_encode(x, 16000, 1, 64)
    tag_body = b"\x00" * 100
    id3 = b"ID3\x04\x00\x00" + bytes(
        [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
         (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]) + tag_body
    path = str(tmp_path / "tagged.mp3")
    with open(path, "wb") as f:
        f.write(id3 + raw)
    data, rate = va_io.decode_audio_file(path)
    assert rate == 16000 and data.shape[0] == 1 and data.shape[1] > 10000


@needs_native
@needs_lame
def test_mp3_through_audio_loader(tmp_path):
    """End-to-end: load_audio resamples a 44.1 kHz mp3 to the pipeline's
    16 kHz mono and the content survives (correlates with the direct
    16 kHz encode of the same signal)."""
    from velocity_asr_tpu.audio import load_audio

    rate = 44100
    x = tone_noise(rate * 1, rate, seed=5)
    path = str(tmp_path / "res.mp3")
    with open(path, "wb") as f:
        f.write(lame_encode(x, rate, 1, 128))
    wav = load_audio(path, sample_rate=16000)
    assert wav.ndim == 1
    assert abs(len(wav) - 16000) < 3000
    # 440 Hz tone must be present at the right frequency after resample
    spec = np.abs(np.fft.rfft(np.asarray(wav, np.float64)))
    peak_hz = np.argmax(spec[:2000]) * 16000 / len(wav) / 2 * 2
    assert abs(peak_hz - 440) < 15


def test_mp3_listed_in_supported_exts():
    exts = va_io.supported_audio_exts()
    if va_io.native_available():
        assert ".mp3" in exts
    else:
        assert ".mp3" not in exts
